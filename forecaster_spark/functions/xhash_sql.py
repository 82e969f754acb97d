"""DuckDB SQL mirrors of :mod:`xhash` — single-statement generators so the
driver's oracle can recompute minhash/simhash/fingerprint value-for-value.

uint64 wraparound arithmetic is emulated with HUGEINT mod 2^64:
- ``umul``     : (a·b) mod 2^64 via 32-bit limb decomposition (a full
                 HUGEINT product of two 64-bit values would overflow 127 bits)
- splitmix64   : staged as lateral-alias column chains (DuckDB resolves
                 SELECT aliases left-to-right), keeping every generated
                 expression O(1) in size — a naively nested splitmix repeats
                 its input ~72×.

All generators return complete single statements (CTEs only, no macros) —
the driver executes oracle SQL with one ``con.execute``.
"""

from __future__ import annotations

from forecaster_spark.functions import xhash

W = 1 << 64  # 2^64
B32 = 1 << 32

C = int(xhash.C)
PHI = int(xhash.PHI)
M1 = int(xhash.M1)
M2 = int(xhash.M2)


def umul(a: str, b: str) -> str:
    """(a·b) mod 2^64 for HUGEINT column refs a, b in [0, 2^64)."""
    return (
        f"((({a})%{B32})*(({b})%{B32})"
        f" + (((({a})//{B32})*(({b})%{B32}) + (({a})%{B32})*(({b})//{B32})) % {B32}) * {B32}"
        f") % {W}"
    )


def umul_c(a: str, b: int) -> str:
    """(a·const) mod 2^64 with the constant's limbs folded in."""
    b %= W
    blo, bhi = b % B32, b // B32
    return (
        f"((({a})%{B32})*{blo}"
        f" + (((({a})//{B32})*{blo} + (({a})%{B32})*{bhi}) % {B32}) * {B32}"
        f") % {W}"
    )


def splitmix_cols(x: str, out: str) -> str:
    """Comma-joined SELECT items computing ``out`` = splitmix64(x) through
    intermediate lateral aliases ``{out}__0..4`` (input x must be a HUGEINT
    expression in [0, 2^64); each stage references the previous ≤3 times)."""
    a = [f"{out}__{i}" for i in range(5)]
    return ", ".join(
        [
            f"(({x}) + {PHI}) % {W} AS {a[0]}",
            f"xor({a[0]}, {a[0]} // {1 << 30}) AS {a[1]}",
            f"{umul_c(a[1], M1)} AS {a[2]}",
            f"xor({a[2]}, {a[2]} // {1 << 27}) AS {a[3]}",
            f"{umul_c(a[3], M2)} AS {a[4]}",
            f"xor({a[4]}, {a[4]} // {1 << 31}) AS {out}",
        ]
    )


def to_int64(x: str) -> str:
    """uint64-in-HUGEINT → its int64 two's-complement value (BIGINT)."""
    return f"CAST(CASE WHEN ({x}) >= {1 << 63} THEN ({x}) - {W} ELSE ({x}) END AS BIGINT)"


def _pow_list(n: int) -> str:
    return "[" + ", ".join(str(int(v)) for v in xhash.pow_table(n)) + "]"


def _bit_list() -> str:
    return "[" + ", ".join(str(1 << b) for b in range(64)) + "]"


def word_hash_ctes(doc_source_sql: str, max_word_len: int | None = None) -> str:
    """CTE chain from ``doc_source_sql`` (must yield (doc_id, text)) to
    ``wh(doc_id, wpos, h)`` — h = splitmix64(Σ_i cp_i·C^i) per whitespace
    word of lower(text), empty words hashing to splitmix64(0) (they arise
    from leading/trailing whitespace under split's keep-empty semantics).
    Codepoints past ``max_word_len`` (default :data:`xhash.MAX_WORD_CP`) are
    excluded by an EXPLICIT cpos filter — the kernel truncates identically,
    so >256-cp tokens (URLs, base64) still hash engine-equal."""
    if max_word_len is None:
        max_word_len = xhash.MAX_WORD_CP
    return f"""
docs_w AS (SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+') AS ws
           FROM ({doc_source_sql}) WHERE text IS NOT NULL),
wr0 AS (SELECT doc_id, unnest(range(len(ws))) AS wpos, ws FROM docs_w),
wr AS (SELECT doc_id, wpos, ws[wpos+1] AS w FROM wr0),
wchars0 AS (SELECT doc_id, wpos, w, unnest(range(length(w))) AS cpos FROM wr),
wchars AS (SELECT * FROM wchars0 WHERE cpos < {max_word_len}),
wterm AS (
  SELECT doc_id, wpos,
         CAST(unicode(substr(w, cpos+1, 1)) AS HUGEINT) AS c,
         ({_pow_list(max_word_len)})[cpos+1] AS pw,
         {umul("c", "pw")} AS term
  FROM wchars
),
wpoly AS (SELECT doc_id, wpos, sum(term) % {W} AS h0 FROM wterm GROUP BY doc_id, wpos),
whp AS (SELECT wr.doc_id, wr.wpos, coalesce(h0, 0) AS h0
        FROM wr LEFT JOIN wpoly USING (doc_id, wpos)),
wh AS (SELECT doc_id, wpos, {splitmix_cols("h0", "h")} FROM whp)
"""


def simhash_sql(doc_source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """Full oracle for ``simhash(documents)`` → (doc_id, simhash BIGINT):
    64-bit bit-majority over the per-word hashes (+1 for a set bit, −1
    otherwise; signature bit set where the sum is positive)."""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
bitsrc AS (SELECT doc_id, h, unnest(range(64)) AS b FROM wh),
bitcnt AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h // ({_bit_list()})[b+1]) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM bitsrc GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         CAST(coalesce(sum(CASE WHEN s > 0 THEN ({_bit_list()})[b+1] ELSE 0 END), 0) AS HUGEINT) % {W} AS v
  FROM bitcnt GROUP BY doc_id
)
SELECT doc_id, {to_int64("v")} AS simhash FROM sig"""


def simhash_neardup_sql(
    max_hamming: int = 3,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``simhash_neardup_pairs``: recompute the signatures with
    the :func:`simhash_sql` chain, then BRUTE-FORCE all-pairs
    ``bit_count(xor)`` ≤ d — deliberately a different algorithm from the
    engine's pigeonhole chunk blocking (which is lossless for distance ≤ d),
    so the two sides cross-check each other's logic, not just arithmetic."""
    return f"""
WITH sigs AS ({simhash_sql(doc_source_sql)})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def shingle_ctes(k: int = 3) -> str:
    """wh → ``shd(doc_id, sh)``: distinct word-k-shingle hashes
    sh = splitmix64(Σ_{{j<k}} h_{{i+j}}·C^j); docs with <k words combine all
    their words into one shingle (mirroring the kernel's short-doc path).

    k=3 keeps the original lead()-unrolled chain (certified oracles stay
    byte-identical); any other k (r5: long-span exact-substring dedup,
    Lee et al. 2021 use ~50-token windows) takes a general relational
    form — a bounded offset self-join on wpos against a k-row power table
    (O(N·k) rows), full windows selected by exact term count, short docs
    by their wpos=0 whole-doc prefix sum."""
    if k != 3:
        return f"""
pwk AS (SELECT j, ({_pow_list(k)})[j + 1] AS p
        FROM (SELECT unnest(range({k})) AS j)),
wm AS (SELECT doc_id, count(*) AS m FROM wh GROUP BY doc_id),
gterm AS (
  SELECT a.doc_id, a.wpos, {umul("b.h", "pw.p")} AS term
  FROM wh a JOIN wh b ON b.doc_id = a.doc_id
       AND b.wpos >= a.wpos AND b.wpos < a.wpos + {k}
  JOIN pwk pw ON pw.j = b.wpos - a.wpos
),
gsum AS (SELECT doc_id, wpos, sum(term) % {W} AS g0, count(*) AS cnt
         FROM gterm GROUP BY doc_id, wpos),
gall AS (
  SELECT g.doc_id, g.g0 FROM gsum g JOIN wm USING (doc_id)
  WHERE (wm.m >= {k} AND g.cnt = {k}) OR (wm.m < {k} AND g.wpos = 0)
),
gsm AS (SELECT doc_id, {splitmix_cols("g0", "sh")} FROM gall),
shd AS (SELECT DISTINCT doc_id, sh FROM gsm)
"""
    return f"""
led AS (
  SELECT doc_id, wpos, h AS h0_, lead(h, 1) OVER w AS h1_, lead(h, 2) OVER w AS h2_,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM wh WINDOW w AS (PARTITION BY doc_id ORDER BY wpos)
),
gfull AS (
  SELECT doc_id, (h0_ + {umul_c("h1_", C)} + {umul_c("h2_", (C * C) % W)}) % {W} AS g0
  FROM led WHERE m >= 3 AND h2_ IS NOT NULL
),
gshort AS (
  SELECT doc_id, (h0_ + coalesce({umul_c("h1_", C)}, 0)) % {W} AS g0
  FROM led WHERE m < 3 AND wpos = 0
),
gsm AS (SELECT doc_id, {splitmix_cols("g0", "sh")}
        FROM (SELECT * FROM gfull UNION ALL SELECT * FROM gshort)),
shd AS (SELECT DISTINCT doc_id, sh FROM gsm)
"""


def contamination_sql(
    bench_filter: str = "doc_id < 20",
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``contamination_flags`` with bench = the corpus subset
    matching ``bench_filter``: shingle once over all docs, mark any doc
    sharing a shingle with the bench subset."""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes()},
bsh AS (SELECT DISTINCT sh FROM shd WHERE {bench_filter}),
hits AS (SELECT DISTINCT doc_id FROM shd WHERE sh IN (SELECT sh FROM bsh))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM ({doc_source_sql}) d LEFT JOIN hits h USING (doc_id)"""


def split_leakage_sql(
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
    holdout: str = "test",
    min_shared: int = 1,
) -> str:
    """Oracle for ``dedup.split_leakage``: hash_split labels (default
    98/1/1 seed-42 spec, inlined via the sampling mirror), one shingling
    pass, train docs counted against the holdout's distinct shingles."""
    from forecaster_spark.operators.sampling import hash_split_sql

    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes()},
spl AS ({hash_split_sql()}),
tsh AS (SELECT DISTINCT sh FROM shd JOIN spl USING (doc_id) WHERE split = '{holdout}'),
tr AS (SELECT shd.doc_id, sh FROM shd JOIN spl USING (doc_id) WHERE split = 'train'),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1),
shr AS (SELECT doc_id, count(*) AS n_shared
        FROM tr WHERE sh IN (SELECT sh FROM tsh) GROUP BY 1)
SELECT t.doc_id, t.n_shingles,
       coalesce(s.n_shared, 0) AS n_shared,
       coalesce(s.n_shared, 0) >= {int(min_shared)} AS leaked
FROM tot t LEFT JOIN shr s USING (doc_id)"""


def minhash_lsh_pairs_sql(
    num_perm: int = 32,
    bands: int = 8,
    verify_jaccard: float = 0.4,
    seed: int = 42,
    doc_source_sql: str = "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents",
) -> str:
    """Full oracle for ``minhash_lsh_pairs`` → (id_a, id_b, jaccard):
    shingles → per-perm min of splitmix64(sh ^ salt_j) → per-band fold hash →
    band-bucket self-join candidates → exact shingle-Jaccard ≥ threshold."""
    rpb = num_perm // bands
    assert rpb == 4, "SQL mirror unrolled for 4 rows/band"
    salts = xhash.minhash_salts(num_perm, seed)
    salt_rows = ", ".join(f"({j}, {int(s)})" for j, s in enumerate(salts))
    # band fold: acc0=0 → a1 = splitmix(b0); a_{i+1} = splitmix(umul(a_i,C)^b_i)
    folds = [f"f1 AS (SELECT doc_id, band_id, b1, b2, b3, {splitmix_cols('b0', 'a1')} FROM bpiv)"]
    for i in (2, 3, 4):
        prev, keep = f"a{i-1}", ", ".join(f"b{j}" for j in range(i, rpb))
        keep = (keep + ", ") if keep else ""
        folds.append(
            f"f{i} AS (SELECT doc_id, band_id, {keep}{umul_c(prev, C)} AS m{i}_, "
            f"{splitmix_cols(f'xor(m{i}_, b{i-1})', f'a{i}')} FROM f{i-1})"
        )
    folds_sql = ",\n".join(folds)
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes()},
salts(perm, salt) AS (VALUES {salt_rows}),
mh AS (SELECT doc_id, perm, {splitmix_cols("xor(sh, salt)", "v")} FROM shd, salts),
sig AS (SELECT doc_id, perm, min(v) AS v FROM mh GROUP BY doc_id, perm),
bpiv AS (
  SELECT doc_id, perm // {rpb} AS band_id,
         max(CASE WHEN perm % {rpb} = 0 THEN v END) AS b0,
         max(CASE WHEN perm % {rpb} = 1 THEN v END) AS b1,
         max(CASE WHEN perm % {rpb} = 2 THEN v END) AS b2,
         max(CASE WHEN perm % {rpb} = 3 THEN v END) AS b3
  FROM sig GROUP BY doc_id, perm // {rpb}
),
{folds_sql},
bt AS (SELECT doc_id, band_id, a{rpb} AS bh FROM f{rpb}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bt a JOIN bt b ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list(sh) AS s FROM shd GROUP BY doc_id)
SELECT id_a, id_b,
       len(list_intersect(sa.s, sb.s)) / len(list_distinct(list_concat(sa.s, sb.s))) AS jaccard
FROM cand JOIN sets sa ON sa.doc_id = id_a JOIN sets sb ON sb.doc_id = id_b
WHERE len(list_intersect(sa.s, sb.s)) / len(list_distinct(list_concat(sa.s, sb.s))) >= {verify_jaccard}"""


def hll_registers_sql(
    p: int = 6,
    key: str = "user_id",
    bucket_unit: str = "hour",
    source_expr: str = "event_type",
    table: str = "events",
) -> str:
    """Oracle for the HLL register tier (`operators/sketches.py`): computes
    the (source, bucket, reg, rho) register table DIRECTLY from raw rows —
    the Spark side cascades 1m partials to the same grain, so a value match
    certifies merge associativity, not just the hash pipeline.
    rho = 1 + leading zeros of the (64−p)-bit remainder; bit_length via
    DuckDB's minimal ``bin()`` string (exact — no float log2)."""
    m = 1 << p
    rho_max = 64 - p + 1
    return f"""
WITH e AS (
  SELECT {source_expr} AS source, date_trunc('{bucket_unit}', ts) AS bucket_start,
         CAST({key} AS HUGEINT) % {W} AS u
  FROM {table} WHERE {key} IS NOT NULL
),
h AS (SELECT source, bucket_start, {splitmix_cols("u", "hv")} FROM e),
r AS (
  SELECT source, bucket_start, CAST(hv % {m} AS INT) AS reg,
         CASE WHEN hv // {m} = 0 THEN {rho_max}
              ELSE {rho_max} - length(bin(CAST(hv // {m} AS BIGINT))) END AS rho
  FROM h
)
SELECT source, bucket_start, reg, CAST(max(rho) AS INT) AS rho
FROM r GROUP BY source, bucket_start, reg"""


def cm_sketch_sql(
    salts: list[int],
    width: int = 128,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for the count-min sketch (`operators/sketches.py`): replays
    every counter cell via the shared word-hash CTEs — count of word
    occurrences with splitmix64(h ⊕ salt_j) mod width per (row j, col)."""
    salt_rows = ", ".join(f"({j}, {int(s)})" for j, s in enumerate(salts))
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
salts(d, salt) AS (VALUES {salt_rows}),
g0 AS (SELECT d, {splitmix_cols("xor(h, salt)", "g")} FROM wh, salts)
SELECT CAST(d AS INT) AS depth, CAST(g % {width} AS INT) AS col, count(*) AS cnt
FROM g0 GROUP BY d, g % {width}"""


def fingerprint_sql(
    k: int = 8,
    keep: int = 4,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Full oracle for the exploded fingerprint query → (doc_id, pos, fp):
    bottom-``keep`` distinct splitmix64 rolling k-gram codepoint hashes of
    lower(text); texts shorter than k hash their codepoint sum."""
    pw = xhash.pow_table(k)
    leads = ", ".join(
        f"lead(c, {j}) OVER wc AS l{j}" if j else "c AS l0" for j in range(k)
    )
    # g[i] = Σ_j cp[i+j]·C^(k-1-j): l_j carries coefficient C^(k-1-j)
    terms = " + ".join(umul_c(f"l{j}", int(pw[k - 1 - j])) for j in range(k))
    return f"""
WITH d AS (SELECT doc_id, lower(text) AS t FROM ({doc_source_sql}) WHERE text IS NOT NULL),
chars AS (SELECT doc_id, unnest(range(length(t))) AS cpos, t FROM d),
cp AS (SELECT doc_id, cpos, CAST(unicode(substr(t, cpos+1, 1)) AS HUGEINT) AS c FROM chars),
led AS (SELECT doc_id, cpos, {leads}, count(*) OVER (PARTITION BY doc_id) AS n
        FROM cp WINDOW wc AS (PARTITION BY doc_id ORDER BY cpos)),
gfull AS (SELECT doc_id, ({terms}) % {W} AS g0 FROM led WHERE n >= {k} AND l{k-1} IS NOT NULL),
gshort AS (SELECT doc_id, sum(c) % {W} AS g0 FROM cp
           GROUP BY doc_id HAVING count(*) < {k}),
gempty AS (SELECT doc_id, CAST(0 AS HUGEINT) AS g0 FROM d WHERE length(t) = 0),
gsm AS (SELECT doc_id, {splitmix_cols("g0", "g")}
        FROM (SELECT * FROM gfull UNION ALL SELECT * FROM gshort UNION ALL SELECT * FROM gempty)),
uq AS (SELECT DISTINCT doc_id, g FROM gsm),
rk AS (SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY g) - 1 AS pos FROM uq)
SELECT doc_id, CAST(pos AS INT) AS pos, {to_int64("g")} AS fp
FROM rk WHERE pos < {keep}"""


def dedup_keep_list_sql(max_hamming: int = 3) -> str:
    """Oracle for ``dedup_keep_list`` over SimHash near-dup pairs: the pair
    set is recomputed with :func:`simhash_neardup_sql` (brute-force — the
    opposite algorithm from the engine's blocking), then clustered by a
    recursive-CTE transitive closure (UNION set semantics terminate it;
    min reachable id = canonical label) — deliberately NOT the engine's
    contraction loop, so the fixpoint itself is cross-checked.

    The non-recursive CTEs are forced MATERIALIZED: DuckDB may otherwise
    inline them into every recursion step, re-running the brute all-pairs
    simhash recompute once per closure iteration (measured: minutes at
    sf0.1 vs seconds materialized)."""
    return f"""
WITH RECURSIVE prs AS MATERIALIZED ({simhash_neardup_sql(max_hamming)}),
e AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
n AS (SELECT DISTINCT u AS id FROM e),
r AS (
  SELECT id, id AS reach FROM n
  UNION
  SELECT r.id, e.v FROM r JOIN e ON e.u = r.reach
),
cc AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM r GROUP BY id)
SELECT d.doc_id,
       coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
       (cc.cluster_id IS NULL OR cc.cluster_id = d.doc_id) AS keep
FROM documents d LEFT JOIN cc USING (doc_id)"""


def tokens_checksum_sql(
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
    max_tok: int = 1024,
) -> str:
    """Oracle for the north-rule token-array invariant: re-derive the
    deterministic tokens (word hash mod 2^31 per split position, empties
    included — exactly ``textops.text_tokens``) and fold the reference
    polynomial checksum ``Σ tok_i·31^(n−1−i) mod 2^64`` in HUGEINT
    arithmetic. tok < 2^31 and 31^k mod 2^64 < 2^64, so each term < 2^95
    and the per-doc sum < 2^102 — inside HUGEINT with no limb splitting.

    The 31-power list is sized ``max_tok`` (default 1024, >10x the
    testdata's 100-word max — pinned in pytest): past it the list index
    would return NULL and sum() would SILENTLY drop the term (the
    word_hash max_word_len lesson), so size it above the corpus bound."""
    pows = "[" + ", ".join(
        f"CAST({pow(31, k, 1 << 64)} AS HUGEINT)" for k in range(max_tok)
    ) + "]"
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
tk AS (SELECT doc_id, wpos, h % 2147483648 AS tok FROM wh),
ln AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
term AS (
  SELECT t.doc_id, t.tok * ({pows})[l.n_tok - t.wpos] AS v
  FROM tk t JOIN ln l USING (doc_id)
),
chk AS (SELECT doc_id, sum(v) % {W} AS c FROM term GROUP BY 1)
SELECT l.doc_id, CAST(l.n_tok AS BIGINT) AS n_tok, {to_int64("c")} AS tok_checksum
FROM ln l JOIN chk USING (doc_id)"""


def chunk_tokens_sql(
    size: int = 64,
    stride: int = 48,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``packing.chunk_tokens``: re-derive the deterministic
    tokens (exactly :func:`tokens_checksum_sql`'s ``tk``), assign each
    token position to the chunks whose window covers it (chunk starts
    every ``stride``, width ``size``), and fold the reference polynomial
    checksum per CHUNK in HUGEINT.  The 31-power list only needs ``size``
    entries — a chunk is never longer than ``size`` (no max_word_len-style
    silent-NULL risk)."""
    pows = "[" + ", ".join(
        f"CAST({pow(31, j, 1 << 64)} AS HUGEINT)" for j in range(size)
    ) + "]"
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
tk AS (SELECT doc_id, wpos, h % 2147483648 AS tok FROM wh),
ln AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
ch AS (
  SELECT doc_id, n_tok, unnest(range(((n_tok - 1) // {stride}) + 1)) AS chunk_idx
  FROM ln WHERE n_tok > 0
),
asn AS (
  SELECT c.doc_id, c.n_tok, c.chunk_idx, c.chunk_idx * {stride} AS chunk_start,
         t.wpos, t.tok
  FROM ch c JOIN tk t ON t.doc_id = c.doc_id
   AND t.wpos >= c.chunk_idx * {stride}
   AND t.wpos <  c.chunk_idx * {stride} + {size}
),
cl AS (
  SELECT doc_id, n_tok, chunk_idx, chunk_start, count(*) AS chunk_len
  FROM asn GROUP BY 1, 2, 3, 4
),
term AS (
  SELECT a.doc_id, a.chunk_idx,
         a.tok * ({pows})[c.chunk_len - (a.wpos - a.chunk_start)] AS v
  FROM asn a JOIN cl c USING (doc_id, chunk_idx)
),
chk AS (SELECT doc_id, chunk_idx, sum(v) % {W} AS c FROM term GROUP BY 1, 2)
SELECT cl.doc_id, CAST(cl.n_tok AS BIGINT) AS n_tok,
       CAST(cl.chunk_idx AS BIGINT) AS chunk_idx,
       CAST(cl.chunk_start AS BIGINT) AS chunk_start,
       CAST(cl.chunk_len AS BIGINT) AS chunk_len,
       {to_int64("c")} AS chunk_checksum
FROM cl JOIN chk USING (doc_id, chunk_idx)"""


def ngram_novelty_sql(
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``dedup.ngram_novelty``: replay the distinct word-3-gram
    splitmix64 shingles (:func:`shingle_ctes` — short-doc path included),
    take min(doc_id) per shingle, and count per doc how many of its
    shingles it owns first."""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes()},
fst AS (SELECT sh, min(doc_id) AS first_doc FROM shd GROUP BY sh)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST((1000000 * sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS novelty_ppm
FROM shd s JOIN fst f USING (sh)
GROUP BY s.doc_id"""


def duplicated_spans_sql(
    top_n: int = 20,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
    k: int = 3,
) -> str:
    """Oracle for ``dedup.duplicated_spans``: replay the distinct word
    k-gram shingles per doc, count docs per span hash, keep spans in >= 2
    docs, and take the deterministic (n_docs desc, unsigned-hash asc)
    top-N; the hash is emitted as its int64 two's-complement value to
    match the kernel's signed long."""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes(k)},
agg AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS n_docs,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
  FROM shd GROUP BY 1 HAVING count(*) >= 2
),
top AS (SELECT * FROM agg ORDER BY n_docs DESC, sh ASC LIMIT {top_n})
SELECT CAST(row_number() OVER (ORDER BY n_docs DESC, sh ASC) AS BIGINT) AS rnk,
       {to_int64("sh")} AS span_hash, n_docs, first_doc, last_doc
FROM top"""


def span_removal_sql(
    top_n: int = 20,
    max_tok: int = 1024,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
    k: int = 3,
) -> str:
    """Oracle for ``dedup.remove_duplicated_spans``: rebuild the
    duplicated-span ledger (distinct word-k-gram hashes per doc, n_docs ≥ 2,
    deterministic top-N), mark every word position covered by ANY
    occurrence of a flagged span (all window starts, not the per-doc
    distinct view; short docs' whole-doc shingle covers all their words),
    and fold the reference polynomial checksum over the surviving words in
    order — HUGEINT end-to-end, fully-removed docs coalesce to checksum 0.

    k=3 keeps the original lead()-unrolled window CTEs byte-identical
    (certified oracle); any other k takes the same general O(N·k) offset
    self-join as :func:`shingle_ctes`, here keeping (wpos, span_len) so
    coverage marking works."""
    c2 = (C * C) % W
    pows = "[" + ", ".join(
        f"CAST({pow(31, j, 1 << 64)} AS HUGEINT)" for j in range(max_tok)
    ) + "]"
    if k == 3:
        gall_ctes = f"""
led AS (
  SELECT doc_id, wpos, h AS h0_, lead(h, 1) OVER w AS h1_, lead(h, 2) OVER w AS h2_,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM wh WINDOW w AS (PARTITION BY doc_id ORDER BY wpos)
),
gall AS (
  SELECT doc_id, wpos, 3 AS span_len,
         (h0_ + {umul_c("h1_", C)} + {umul_c("h2_", c2)}) % {W} AS g0
  FROM led WHERE m >= 3 AND h2_ IS NOT NULL
  UNION ALL
  SELECT doc_id, wpos, m AS span_len,
         (h0_ + coalesce({umul_c("h1_", C)}, 0)) % {W} AS g0
  FROM led WHERE m < 3 AND wpos = 0
)"""
    else:
        gall_ctes = f"""
pwk AS (SELECT j, ({_pow_list(k)})[j + 1] AS p
        FROM (SELECT unnest(range({k})) AS j)),
wm AS (SELECT doc_id, count(*) AS m FROM wh GROUP BY doc_id),
gterm AS (
  SELECT a.doc_id, a.wpos, {umul("b.h", "pw.p")} AS term
  FROM wh a JOIN wh b ON b.doc_id = a.doc_id
       AND b.wpos >= a.wpos AND b.wpos < a.wpos + {k}
  JOIN pwk pw ON pw.j = b.wpos - a.wpos
),
gsum AS (SELECT doc_id, wpos, sum(term) % {W} AS g0, count(*) AS cnt
         FROM gterm GROUP BY doc_id, wpos),
gall AS (
  SELECT g.doc_id, g.wpos,
         CASE WHEN wm.m >= {k} THEN {k} ELSE wm.m END AS span_len, g.g0
  FROM gsum g JOIN wm USING (doc_id)
  WHERE (wm.m >= {k} AND g.cnt = {k}) OR (wm.m < {k} AND g.wpos = 0)
)"""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{gall_ctes},
gsm AS (SELECT doc_id, wpos, span_len, {splitmix_cols("g0", "sh")} FROM gall),
shd AS (SELECT DISTINCT doc_id, sh FROM gsm),
agg AS (SELECT sh, count(*) AS n_docs FROM shd GROUP BY 1 HAVING count(*) >= 2),
flag AS (SELECT sh FROM agg ORDER BY n_docs DESC, sh ASC LIMIT {top_n}),
cov0 AS (
  SELECT g.doc_id, g.wpos + unnest(range(g.span_len)) AS cpos
  FROM gsm g JOIN flag f USING (sh)
),
cov AS (SELECT DISTINCT doc_id, cpos FROM cov0),
ln AS (SELECT doc_id, count(*) AS n_words FROM wh GROUP BY 1),
kept AS (
  SELECT w.doc_id, w.wpos, w.h % 2147483648 AS tok
  FROM wh w LEFT JOIN cov c ON c.doc_id = w.doc_id AND c.cpos = w.wpos
  WHERE c.doc_id IS NULL
),
krk AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY wpos) AS r,
         count(*) OVER (PARTITION BY doc_id) AS nk
  FROM kept
),
term AS (SELECT doc_id, nk, tok * ({pows})[nk - r + 1] AS v FROM krk),
chk AS (SELECT doc_id, max(nk) AS nk, sum(v) % {W} AS c FROM term GROUP BY 1)
SELECT l.doc_id, CAST(l.n_words AS BIGINT) AS n_words,
       CAST(l.n_words - coalesce(k.nk, 0) AS BIGINT) AS n_removed,
       coalesce({to_int64("k.c")}, 0) AS clean_checksum
FROM ln l LEFT JOIN chk k USING (doc_id)"""


def bpe_encode_sql(
    merges: list[tuple[str, str]],
    max_tok: int = 8192,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``textops.bpe_encode``: the GPT-2-style BPE encoder as a
    recursive-CTE STATE MACHINE over the distinct-word vocabulary (the
    isotonic/PAVA recipe — state carried as per-(word, pos, symbol) ROWS,
    one recursion step = one merge round applying the minimum-rank present
    pair at all left-to-right non-overlapping occurrences via run-parity
    window functions; terminal state = max step per word). Subword strings
    are then hashed with the same codepoint-polynomial→splitmix chain as
    words, and the per-doc reference polynomial checksum folds the
    flattened subword token stream in HUGEINT (tok < 2^31, 31-powers
    < 2^64 → terms < 2^95, sums < 2^102 — the tokens_checksum bound).

    Merge ranks are inlined as a chr(31)-separated key list — symbols
    never contain the separator (initial symbols are single codepoints,
    merged symbols concatenate merge outputs), so the key encoding is
    injective.

    ``max_tok`` bounds the per-doc SUBWORD count (worst case = total
    codepoints when no merge applies — NOT the word count): past it the
    31-power list index returns NULL and sum() silently drops the term
    (the word_hash max_word_len lesson), so it is sized 8192 ≈ 5× the
    testdata's worst-case codepoint bound; a pytest pins the margin."""
    keys = ", ".join(
        "'" + l.replace("'", "''") + "' || chr(31) || '" + r.replace("'", "''") + "'"
        for l, r in merges
    )
    pows31 = "[" + ", ".join(
        f"CAST({pow(31, j, 1 << 64)} AS HUGEINT)" for j in range(max_tok)
    ) + "]"
    mwl = xhash.MAX_WORD_CP
    return f"""
WITH RECURSIVE {word_hash_ctes(doc_source_sql)},
vw AS (SELECT DISTINCT w FROM wr WHERE length(w) > 0),
r AS (
  SELECT w, 0 AS step, CAST(cpos AS BIGINT) AS pos, substr(w, CAST(cpos AS INT)+1, 1) AS sym
  FROM (SELECT w, unnest(range(length(w))) AS cpos FROM vw)
  UNION ALL
  SELECT w, step + 1, row_number() OVER (PARTITION BY w ORDER BY pos) - 1, new_sym
  FROM (
    SELECT w, step, pos,
           CASE WHEN mstart THEN sym || nxt ELSE sym END AS new_sym,
           mstart, coalesce(lag(mstart) OVER (PARTITION BY w ORDER BY pos), false) AS consumed, mr
    FROM (
      SELECT *, matching AND (row_number() OVER (PARTITION BY w, matching, grp ORDER BY pos) % 2 = 1) AS mstart
      FROM (
        SELECT *, pos - row_number() OVER (PARTITION BY w, matching ORDER BY pos) AS grp
        FROM (
          SELECT *, rank_i IS NOT NULL AND rank_i = mr AS matching
          FROM (
            SELECT *, min(rank_i) OVER (PARTITION BY w) AS mr
            FROM (
              SELECT w, step, pos, sym, nxt,
                     CASE WHEN nxt IS NULL THEN NULL
                          WHEN list_position([{keys}], sym || chr(31) || nxt) = 0 THEN NULL
                          ELSE list_position([{keys}], sym || chr(31) || nxt) END AS rank_i
              FROM (SELECT w, step, pos, sym,
                           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM r)
            )
          )
        )
      )
    )
  )
  WHERE mr IS NOT NULL AND NOT consumed
),
fin AS (SELECT w, pos, sym FROM (
  SELECT *, max(step) OVER (PARTITION BY w) AS ms FROM r) WHERE step = ms),
schars0 AS (SELECT w, pos, sym, unnest(range(length(sym))) AS cpos FROM fin),
schars AS (SELECT * FROM schars0 WHERE cpos < {mwl}),
sterm AS (
  SELECT w, pos,
         {umul(f"CAST(unicode(substr(sym, CAST(cpos AS INT)+1, 1)) AS HUGEINT)", f"({_pow_list(mwl)})[cpos+1]")} AS term
  FROM schars
),
spoly AS (SELECT w, pos, sum(term) % {W} AS h0 FROM sterm GROUP BY w, pos),
shp AS (SELECT f.w, f.pos, coalesce(h0, 0) AS h0 FROM fin f LEFT JOIN spoly USING (w, pos)),
ssm AS (SELECT w, pos, {splitmix_cols("h0", "sh")} FROM shp),
stok AS (SELECT w, pos, sh % 2147483648 AS tok FROM ssm),
wcnt AS (SELECT w, count(*) AS c FROM stok GROUP BY w),
dw AS (SELECT wr.doc_id, wr.wpos, wr.w, coalesce(wcnt.c, 0) AS c
       FROM wr LEFT JOIN wcnt USING (w)),
ofs AS (SELECT doc_id, wpos, w, c,
               sum(c) OVER (PARTITION BY doc_id ORDER BY wpos) - c AS off,
               sum(c) OVER (PARTITION BY doc_id) AS n_sub,
               count(*) OVER (PARTITION BY doc_id) AS n_words
        FROM dw),
terms AS (
  SELECT o.doc_id, s.tok * ({pows31})[CAST(o.n_sub - o.off - s.pos AS BIGINT)] AS v
  FROM ofs o JOIN stok s ON s.w = o.w
),
chk AS (SELECT doc_id, sum(v) % {W} AS cs FROM terms GROUP BY doc_id),
ln AS (SELECT doc_id, max(n_words) AS n_words, max(n_sub) AS n_sub FROM ofs GROUP BY doc_id)
SELECT l.doc_id, CAST(l.n_words AS BIGINT) AS n_words,
       CAST(l.n_sub AS BIGINT) AS n_subwords,
       coalesce({to_int64("chk.cs")}, 0) AS bpe_checksum
FROM ln l LEFT JOIN chk USING (doc_id)"""


def cdc_chunk_ledger_sql(
    g: int = 4,
    mask_bits: int = 3,
    top_n: int = 20,
    max_words: int = 256,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``dedup.cdc_chunk_ledger``: replay the trailing-g-word
    rolling hash (the general offset-self-join shingle form keyed by
    window start), the low-bits-zero boundary predicate, per-chunk
    polynomial hashes with exponents reset at each chunk start (window
    min + the ``max_words``-sized power list — sized far above the corpus
    word bound, else list indexing would NULL out and silently drop
    terms), and the deterministic (n_docs desc, n_occ desc, unsigned
    hash asc) top-N."""
    mask = 1 << mask_bits
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
pwk AS (SELECT j, ({_pow_list(g)})[j + 1] AS p
        FROM (SELECT unnest(range({g})) AS j)),
wm AS (SELECT doc_id, count(*) AS m FROM wh GROUP BY doc_id),
gterm AS (
  SELECT a.doc_id, a.wpos, {umul("b.h", "pw.p")} AS term
  FROM wh a JOIN wh b ON b.doc_id = a.doc_id
       AND b.wpos >= a.wpos AND b.wpos < a.wpos + {g}
  JOIN pwk pw ON pw.j = b.wpos - a.wpos
),
gsum AS (SELECT doc_id, wpos, sum(term) % {W} AS g0, count(*) AS cnt
         FROM gterm GROUP BY doc_id, wpos),
gwv AS (SELECT g.doc_id, g.wpos, g.g0 FROM gsum g JOIN wm USING (doc_id)
        WHERE g.cnt = {g} AND g.wpos <= wm.m - {g}),
gw AS (SELECT doc_id, wpos, {splitmix_cols("g0", "wh_")} FROM gwv),
bnd AS (SELECT doc_id, wpos + {g - 1} AS e FROM gw WHERE wh_ % {mask} = 0),
cs AS (
  SELECT w.doc_id, w.wpos, w.h,
         CASE WHEN w.wpos = 0 OR b.e IS NOT NULL THEN 1 ELSE 0 END AS st
  FROM wh w LEFT JOIN bnd b ON b.doc_id = w.doc_id AND b.e = w.wpos - 1
),
cid AS (SELECT doc_id, wpos, h,
               sum(st) OVER (PARTITION BY doc_id ORDER BY wpos) AS c
        FROM cs),
cw AS (SELECT doc_id, wpos, h, c,
              min(wpos) OVER (PARTITION BY doc_id, c) AS cst
       FROM cid),
cterm AS (SELECT doc_id, c,
                 {umul("h", f"({_pow_list(max_words)})[wpos - cst + 1]")} AS term
          FROM cw),
csum AS (SELECT doc_id, c, sum(term) % {W} AS g0 FROM cterm GROUP BY doc_id, c),
chk AS (SELECT doc_id, {splitmix_cols("g0", "ch")} FROM csum),
per AS (SELECT doc_id, ch, count(*) AS occ FROM chk GROUP BY 1, 2),
agg AS (SELECT ch, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occ,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM per GROUP BY 1 HAVING count(*) >= 2),
top AS (SELECT * FROM agg ORDER BY n_docs DESC, n_occ DESC, ch ASC LIMIT {top_n})
SELECT CAST(row_number() OVER (ORDER BY n_docs DESC, n_occ DESC, ch ASC) AS BIGINT) AS rnk,
       {to_int64("ch")} AS chunk_hash, n_docs, n_occ, first_doc, last_doc
FROM top"""


def data_loader_sql(
    p: int = 3,
    batch_size: int = 64,
    quantum: int = 1000,
    series_sql: str = "SELECT event_type AS source, ts, value AS y, event_id FROM events",
) -> str:
    """Oracle for ``loader.data_loader_manifest`` (reference
    Util/data_loader.py:5-19): replay the W1 first-value-padded lag matrix
    over the whole series, the sklearn chronological 80/20 split
    (``n_test = (n+4)//5``, test = tail), contiguous batch assignment, and
    fold each batch's flattened (lag_p..lag_1, y) milli-quantized tokens
    through the reference polynomial ``Σ tok_j·31^(L−1−j) mod 2^64`` in
    HUGEINT. tok < 2^31 and each batch holds ≤ batch_size·(p+1) tokens, so
    terms < 2^95 and per-batch sums < 2^103 — inside HUGEINT with no limb
    splitting (same bound argument as ``tokens_checksum_sql``)."""
    width = p + 1
    pows = "[" + ", ".join(
        f"CAST({pow(31, k, 1 << 64)} AS HUGEINT)" for k in range(batch_size * width)
    ) + "]"
    lag_cols = ",\n         ".join(
        f"coalesce(lag(tok,{k}) OVER w, first_value(tok) OVER w) AS l{k}"
        for k in range(p, 0, -1)
    )
    terms = "\n       + ".join(
        f"CAST(b.l{p - c} AS HUGEINT) * ({pows})[c.n_rows*{width} - (b.pib*{width} + {c})]"
        for c in range(p)
    ) + f"\n       + CAST(b.tok AS HUGEINT) * ({pows})[c.n_rows*{width} - (b.pib*{width} + {p})]"
    lag_names = ", ".join(f"l{k}" for k in range(p, 0, -1))
    return f"""
WITH series AS ({series_sql}),
q AS (
  SELECT source, ts, event_id,
         ((CAST(floor(y*{quantum}) AS BIGINT) % 2147483648) + 2147483648) % 2147483648 AS tok
  FROM series),
l AS (
  SELECT source, ts, event_id, tok,
         {lag_cols},
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM q WINDOW w AS (PARTITION BY source ORDER BY ts, event_id)),
s AS (SELECT *, CASE WHEN rn <= n - ((n+4)//5) THEN 'train' ELSE 'test' END AS split FROM l),
pp AS (SELECT *, row_number() OVER (PARTITION BY source, split ORDER BY ts, event_id) - 1 AS pos FROM s),
b AS (SELECT source, split, pos // {batch_size} AS batch_id, pos % {batch_size} AS pib,
             {lag_names}, tok FROM pp),
cnt AS (SELECT source, split, batch_id, count(*) AS n_rows FROM b GROUP BY 1, 2, 3),
term AS (
  SELECT b.source, b.split, b.batch_id,
         {terms} AS v
  FROM b JOIN cnt c USING (source, split, batch_id)),
chk AS (SELECT source, split, batch_id, sum(v) % {W} AS c FROM term GROUP BY 1, 2, 3)
SELECT k.source, k.split, CAST(k.batch_id AS BIGINT) AS batch_id,
       CAST(k.n_rows AS BIGINT) AS n_rows, {to_int64("c")} AS xy_checksum
FROM cnt k JOIN chk USING (source, split, batch_id)
ORDER BY source, split, batch_id"""


def bigram_fluency_sql(
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``textops.bigram_fluency``: re-derive the deterministic
    tokens, pair adjacent positions into bigram keys ``a·2^31 + b``, count
    corpus bigrams / prefixes, and floor each conditional probability at
    ppm with the SAME association as the kernel
    (``floor((1000000.0 · c_ab) / c_a)`` — multiply first, one division);
    per-doc terms are exact integers summed order-free, mean is one IEEE
    division. Docs with < 2 tokens are excluded on both engines."""
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
tk AS (SELECT doc_id, wpos, h % 2147483648 AS tok FROM wh),
bg AS (
  SELECT t1.doc_id, t1.tok * 2147483648 + t2.tok AS key, t1.tok AS a
  FROM tk t1 JOIN tk t2 ON t2.doc_id = t1.doc_id AND t2.wpos = t1.wpos + 1
),
db AS (SELECT doc_id, key, a, count(*) AS m FROM bg GROUP BY 1, 2, 3),
cab AS (SELECT key, count(*) AS cab FROM bg GROUP BY 1),
cpre AS (SELECT a, count(*) AS ca FROM bg GROUP BY 1),
term AS (
  SELECT d.doc_id, d.m,
         CAST(floor((1000000.0 * CAST(c.cab AS DOUBLE)) / CAST(p.ca AS DOUBLE)) AS BIGINT) AS t
  FROM db d JOIN cab c USING (key) JOIN cpre p USING (a)
)
SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       CAST(sum(m * t) AS BIGINT) AS flu_sum_ppm,
       CAST(sum(m * t) AS DOUBLE) / CAST(sum(m) AS DOUBLE) AS fluency_ppm
FROM term GROUP BY doc_id"""


def bloom_contamination_sql(
    bench_filter: str = "doc_id < 20",
    m_bits: int = 4096,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``dedup.bloom_contamination``: replay the two bit-probe
    positions per shingle (low log2(m) bits / bits 32.. of the uint64
    splitmix hash — ``sh % m`` and ``(sh >> 32) % m`` on the HUGEINT,
    identical bit patterns to the kernel's masks on the signed long) and
    test membership against the UNION of positions the bench set lights —
    set-semantics-equal to the engine's bit_or'd word array, so flags
    (including bloom false positives) match exactly."""
    assert m_bits & (m_bits - 1) == 0
    return f"""
WITH {word_hash_ctes(doc_source_sql)},
{shingle_ctes()},
bp AS (
  SELECT DISTINCT p FROM (
    SELECT sh % {m_bits} AS p FROM shd WHERE {bench_filter}
    UNION ALL
    SELECT (sh // 4294967296) % {m_bits} AS p FROM shd WHERE {bench_filter}
  )
),
cp AS (SELECT doc_id, sh % {m_bits} AS p1, (sh // 4294967296) % {m_bits} AS p2
       FROM shd),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN p1 IN (SELECT p FROM bp)
                        AND p2 IN (SELECT p FROM bp) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM cp GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_shingles, 0) AS n_shingles,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS flagged
FROM ({doc_source_sql}) d LEFT JOIN hits h USING (doc_id)"""


def span_corruption_sql(
    span_len: int = 3,
    rate_pct: int = 15,
    seed: int = 9,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``packing.span_corruption_layout``: replay the stratified
    span placement — k = max(1, n·rate div (100·L)) strata, span i at
    ``lo_i + splitmix64(doc_id·1000003 + i·(2·seed+1)) mod (L_i − L + 1)``
    — through the HUGEINT splitmix chain."""
    mult = 2 * seed + 1
    denom = 100 * span_len
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tok
  FROM ({doc_source_sql}) WHERE text IS NOT NULL
), k AS (
  SELECT doc_id, n_tok,
         CAST(greatest(1, (n_tok * {rate_pct}) // {denom}) AS BIGINT) AS n_spans
  FROM d WHERE n_tok >= {span_len}
), e AS (
  SELECT doc_id, n_tok, n_spans, unnest(range(n_spans)) AS span_i FROM k
), wv AS (
  SELECT doc_id, n_tok, n_spans, span_i,
         (span_i * n_tok) // n_spans AS lo,
         ((span_i + 1) * n_tok) // n_spans
           - (span_i * n_tok) // n_spans - {span_len - 1} AS wd,
         CAST((doc_id * 1000003 + span_i * {mult}) % {W} AS HUGEINT) AS x0
  FROM e
), hh AS (
  SELECT doc_id, n_tok, n_spans, span_i, lo, wd, {splitmix_cols("x0", "h")} FROM wv
)
SELECT doc_id, n_tok, n_spans, CAST(span_i AS BIGINT) AS span_i,
       CAST(lo + h % wd AS BIGINT) AS start,
       CAST({span_len} AS BIGINT) AS length
FROM hh"""


def winnowing_ctes(
    k: int = 3,
    w: int = 4,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """CTE chain ending in ``wfp(doc_id, pos, h)`` — the distinct selected
    winnowing fingerprint entries (see :func:`winnowing_sql`). Shared by
    the fingerprint oracle and the pair oracle."""
    assert k == 3, "SQL mirror unrolled for k=3"
    return f"""{word_hash_ctes(doc_source_sql)},
led AS (
  SELECT doc_id, wpos, h AS h0_, lead(h, 1) OVER wnd AS h1_, lead(h, 2) OVER wnd AS h2_,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM wh WINDOW wnd AS (PARTITION BY doc_id ORDER BY wpos)
), g AS (
  SELECT doc_id, wpos,
         (h0_ + {umul_c("h1_", C)} + {umul_c("h2_", (C * C) % W)}) % {W} AS g0
  FROM led WHERE m >= 3 AND h2_ IS NOT NULL
), gs AS (
  SELECT doc_id, wpos, {splitmix_cols("g0", "sh")} FROM g
), winmin AS (
  SELECT doc_id, wpos,
         min(sh * 4294967296 + wpos) OVER (PARTITION BY doc_id ORDER BY wpos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS key,
         count(*) OVER (PARTITION BY doc_id) AS mg
  FROM gs
), wfp AS (
  SELECT DISTINCT doc_id, CAST(key % 4294967296 AS BIGINT) AS pos,
         {to_int64("key // 4294967296")} AS h
  FROM winmin
  WHERE wpos <= CASE WHEN mg >= {w} THEN mg - {w} ELSE 0 END
)"""


def winnowing_sql(
    k: int = 3,
    w: int = 4,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``textops.winnowing_fingerprint``: positional word-k-
    shingle hashes (the :func:`shingle_ctes` combine, wpos kept), then the
    window minimum over ``w`` consecutive shingles with the
    (hash, position)-lexicographic tie rule encoded as
    ``min(sh·2^32 + wpos)`` — a HUGEINT pack the kernel's uint64
    first-occurrence argmin matches exactly. Valid window starts are
    wpos ≤ mg−w (one clipped window at 0 when mg < w)."""
    return f"""
WITH {winnowing_ctes(k, w, doc_source_sql)}
SELECT doc_id, pos, h FROM wfp"""


def winnowing_pairs_sql(
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    bucket_cap: int = 64,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``textops.winnowing_neardup_pairs``: distinct (doc, h)
    fingerprint entries, hash buckets capped at ``bucket_cap`` docs (hot
    shared-boilerplate buckets dropped, like stop-shingle pruning), pairs
    from within-bucket joins, per-pair shared-hash counts, and the
    Jaccard / containment estimates as single divisions of exact BIGINTs
    (fingerprint-set sizes count ALL entries, including dropped buckets —
    the standard winnowing estimate under hot-bucket pruning)."""
    return f"""
WITH {winnowing_ctes(k, w, doc_source_sql)},
fps AS (SELECT DISTINCT doc_id, h FROM wfp),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM fps GROUP BY doc_id),
bk AS (SELECT h FROM fps GROUP BY h
       HAVING count(*) >= 2 AND count(*) <= {bucket_cap}),
pr AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM fps a JOIN bk USING (h) JOIN fps b USING (h)
  WHERE a.doc_id < b.doc_id
), ag AS (
  SELECT ia, ib, CAST(count(*) AS BIGINT) AS ns FROM pr GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
)
SELECT ag.ia AS id_a, ag.ib AS id_b, ag.ns AS n_shared,
       sa.c AS fp_a, sb.c AS fp_b,
       CAST(ag.ns AS DOUBLE) / CAST(sa.c + sb.c - ag.ns AS DOUBLE) AS jac,
       CAST(ag.ns AS DOUBLE) / CAST(sa.c AS DOUBLE) AS cont_a,
       CAST(ag.ns AS DOUBLE) / CAST(sb.c AS DOUBLE) AS cont_b
FROM ag
JOIN sz sa ON sa.doc_id = ag.ia
JOIN sz sb ON sb.doc_id = ag.ib"""


def ul2_denoiser_sql(
    seed: int = 11,
    doc_source_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Oracle for ``packing.ul2_denoiser_layout``: replay the denoiser
    assignment ``splitmix64(doc_id·2654435761 + 101) mod 3`` and the
    per-denoiser stratified placement through HUGEINT splitmix chains
    (R: L=3 rate 15%; X: L=12 rate 30%; S: one final-quarter span with
    window width 1 so the offset chain contributes 0)."""
    mult = 2 * seed + 1
    return f"""
WITH d0 AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tok,
         CAST((CAST(doc_id AS HUGEINT) * 2654435761 + 101) % {W} AS HUGEINT) AS dx0
  FROM ({doc_source_sql}) WHERE text IS NOT NULL
), dh AS (
  SELECT doc_id, n_tok, {splitmix_cols("dx0", "dhv")} FROM d0
), dd AS (
  SELECT doc_id, n_tok, CAST(dhv % 3 AS BIGINT) AS d FROM dh
), el AS (
  SELECT doc_id, n_tok, d,
         CASE WHEN d = 0 THEN greatest(1, (n_tok * 15) // 300)
              WHEN d = 1 THEN greatest(1, n_tok // 40)
              ELSE 1 END AS n_spans,
         CASE WHEN d = 0 THEN 3 WHEN d = 1 THEN 12 ELSE n_tok // 4 END AS len_
  FROM dd
  WHERE (d = 0 AND n_tok >= 3) OR (d = 1 AND n_tok >= 12) OR (d = 2 AND n_tok >= 4)
), e AS (
  SELECT doc_id, n_tok, d, n_spans, len_, unnest(range(n_spans)) AS span_i FROM el
), wv AS (
  SELECT doc_id, n_tok, d, n_spans, len_, span_i,
         CASE WHEN d = 2 THEN n_tok - len_
              ELSE (span_i * n_tok) // n_spans END AS lo,
         CASE WHEN d = 2 THEN 1
              ELSE ((span_i + 1) * n_tok) // n_spans
                   - (span_i * n_tok) // n_spans - (len_ - 1) END AS wd,
         CAST((doc_id * 1000003 + span_i * {mult}) % {W} AS HUGEINT) AS x0
  FROM e
), hh AS (
  SELECT doc_id, n_tok, d, n_spans, len_, span_i, lo, wd, {splitmix_cols("x0", "h")} FROM wv
)
SELECT doc_id,
       CASE WHEN d = 0 THEN 'R' WHEN d = 1 THEN 'X' ELSE 'S' END AS denoiser,
       n_tok, CAST(n_spans AS BIGINT) AS n_spans, CAST(span_i AS BIGINT) AS span_i,
       CAST(lo + h % wd AS BIGINT) AS start,
       CAST(len_ AS BIGINT) AS length
FROM hh"""
