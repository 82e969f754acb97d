"""Property-based parity for the cross-engine hash layer: on RANDOM unicode
words the numpy primitives (xhash) and the generated DuckDB SQL (xhash_sql)
must agree value-for-value — word hashes, shingle sets, and simhash
bit-majorities. This is the layer every near-dup oracle stands on; the
driver only ever exercises it on ASCII corpus text, so fuzz the rest here.
No Spark needed — pure numpy vs DuckDB."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

duckdb = pytest.importorskip("duckdb")

from forecaster_spark.functions import xhash, xhash_sql  # noqa: E402

# printable non-whitespace unicode (whitespace would re-split the joined doc)
_word = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=0x2FFF, exclude_categories=("Z", "C")
    ),
    min_size=1,
    max_size=10,
)


def _con_for(text: str):
    con = duckdb.connect()
    esc = text.replace("'", "''")
    con.execute(f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{esc}' AS text")
    return con


def _np_word_hashes(words: list[str]) -> np.ndarray:
    return xhash.word_hash_flat(words)


def _np_shingles(wh: np.ndarray, k: int = 3) -> np.ndarray:
    m = len(wh)
    if m >= k:
        pw = xhash.pow_table(k)
        g = np.zeros(m - k + 1, np.uint64)
        for j in range(k):
            g += wh[j : m - k + 1 + j] * pw[j]
    elif m > 0:
        g = np.array([(wh * xhash.pow_table(m)).sum(dtype=np.uint64)], dtype=np.uint64)
    else:
        return np.array([0], dtype=np.uint64)
    return np.unique(xhash.splitmix64(g))


@settings(max_examples=40, deadline=None)
@given(st.lists(_word, min_size=1, max_size=8))
def test_word_hash_and_shingles_sql_parity(words):
    text = " ".join(words)
    con = _con_for(text)
    sql = f"WITH {xhash_sql.word_hash_ctes('SELECT doc_id, text FROM documents')}, "
    # the SQL chain lower()s the text; isolate HASH parity by feeding the
    # numpy side DuckDB's own lowered words (Spark-vs-DuckDB case-folding
    # equivalence is a separate concern, exercised by the driver's corpus)
    lowered = [
        r[0]
        for r in con.execute(
            "SELECT unnest(string_split_regex(lower(text), '\\s+')) FROM documents"
        ).fetchall()
    ]
    # fetchall keeps HUGEINTs as exact Python ints (.df() would round them
    # through float64)
    got_wh = [r[0] for r in con.execute(
        sql + "x AS (SELECT 1) SELECT h FROM wh ORDER BY wpos"
    ).fetchall()]
    want_wh = _np_word_hashes(lowered)
    assert got_wh == [int(v) for v in want_wh]

    got_sh = [r[0] for r in con.execute(
        sql + f"{xhash_sql.shingle_ctes()} SELECT sh FROM shd ORDER BY sh"
    ).fetchall()]
    want_sh = sorted(int(v) for v in _np_shingles(want_wh))
    assert got_sh == want_sh


@settings(max_examples=25, deadline=None)
@given(st.lists(_word, min_size=1, max_size=8))
def test_simhash_sql_parity(words):
    text = " ".join(words)
    con = _con_for(text)
    got = con.execute(
        xhash_sql.simhash_sql("SELECT doc_id, text FROM documents")
    ).fetchall()[0][1]
    lowered = [
        r[0]
        for r in con.execute(
            "SELECT unnest(string_split_regex(lower(text), '\\s+')) FROM documents"
        ).fetchall()
    ]
    wh = _np_word_hashes(lowered)
    bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    counts = bits.sum(axis=0) * 2 - len(wh)
    sig = np.uint64(0)
    for b in np.flatnonzero(counts > 0):
        sig |= np.uint64(1) << np.uint64(b)
    assert got == int(sig.view(np.int64)) or got == int(np.int64(sig.astype(np.int64)))


def test_word_hash_truncation_parity_long_words():
    """>MAX_WORD_CP-codepoint tokens (URLs, base64 blobs) must hash
    engine-equal: both sides truncate to the first 256 codepoints (r2 bug:
    the SQL power-list index returned NULL terms that sum() dropped while
    the kernel hashed the full word)."""
    M = xhash.MAX_WORD_CP
    words = ["x" * (M + 50), "y" * M, "z" * (M - 1), "ab", "q" * (M + 1)]
    text = " ".join(words)
    con = _con_for(text)
    sql = f"WITH {xhash_sql.word_hash_ctes('SELECT doc_id, text FROM documents')} "
    got = [r[0] for r in con.execute(sql + "SELECT h FROM wh ORDER BY wpos").fetchall()]
    want = [int(v) for v in xhash.word_hash_flat(words)]
    assert got == want
    # truncation semantics: chars past the bound are ignored entirely
    h_trunc = xhash.word_hash_flat(["x" * M])[0]
    h_long = xhash.word_hash_flat(["x" * (M + 50)])[0]
    assert h_trunc == h_long
    assert xhash.word_hash_flat(["x" * (M - 1)])[0] != h_trunc


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=600),
)
def test_pack_sequences_oracle_parity_fuzz(n_toks, budget):
    """The recursive-CTE packing oracle must replay the greedy walk for
    arbitrary token counts and budgets (oversized docs, exact fits, runs
    of zeros)."""
    from forecaster_spark.operators.packing import pack_sequences_sql

    con = duckdb.connect()
    rows = ", ".join(f"({i}, 'x', {n})" for i, n in enumerate(n_toks))
    con.execute(f"CREATE VIEW docs AS SELECT * FROM (VALUES {rows}) t(doc_id, lang, n_tok)")
    sql = pack_sequences_sql(
        budget=budget, doc_source_sql="SELECT doc_id, lang, n_tok FROM docs"
    )
    got = {
        r[1]: (r[3], r[4])
        for r in con.execute(sql + " ORDER BY doc_id").fetchall()
    }
    b, fill, want = 0, 0, {}
    for i, n in enumerate(n_toks):
        if fill > 0 and fill + n > budget:
            b += 1
            fill = 0
        fill += n
        want[i] = (b, fill)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=50, unique=True))
def test_hash_split_oracle_parity_fuzz(ids):
    """The DuckDB splitmix bucket pipeline must reproduce the numpy kernel
    for arbitrary int64 ids, including the extremes (two's-complement
    mod-2^64 mapping)."""
    import numpy as np

    from forecaster_spark.operators.sampling import BUCKETS, hash_split_sql

    con = duckdb.connect()
    rows = ", ".join(f"({i})" for i in ids)
    con.execute(f"CREATE VIEW docs AS SELECT * FROM (VALUES {rows}) t(doc_id)")
    sql = hash_split_sql(source_sql="SELECT doc_id FROM docs")
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    u = np.array(ids, dtype=np.int64).view(np.uint64)
    want_b = (xhash.splitmix64(u * np.uint64(2 * 42 + 1)) % np.uint64(BUCKETS)).astype(np.int64)
    assert got == {i: int(b) for i, b in zip(ids, want_b)}


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_temperature_mixture_oracle_parity_fuzz(rows):
    """The DuckDB mixture oracle's (rate_ppm, n_kept) must equal the pure
    python/numpy definition for arbitrary int64 ids and group skews: rate =
    floor(1e6·sqrt(n_min/n_g)) with one correctly-rounded sqrt, keep =
    splitmix bucket < rate."""
    import math

    import numpy as np

    from forecaster_spark.operators.sampling import BUCKETS, temperature_mixture_sql

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{g}')" for i, g in rows)
    con.execute(f"CREATE VIEW docs AS SELECT * FROM (VALUES {vals}) t(doc_id, lang)")
    sql = temperature_mixture_sql(source_sql="SELECT doc_id, lang FROM docs")
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}

    by_g: dict = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    n_min = min(len(v) for v in by_g.values())
    want = {}
    for g, ids in by_g.items():
        rate = math.floor(1_000_000 * math.sqrt(n_min / len(ids)))
        u = np.array(ids, dtype=np.int64).view(np.uint64)
        b = (xhash.splitmix64(u * np.uint64(2 * 7 + 1)) % np.uint64(BUCKETS)).astype(np.int64)
        want[g] = (len(ids), rate, int((b < rate).sum()))
    assert got == want
