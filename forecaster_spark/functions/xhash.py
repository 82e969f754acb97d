"""Cross-engine 64-bit hash primitives shared by the dedup/textops Arrow
kernels AND reproducible in single-statement DuckDB SQL (see
``xhash_sql.py``), so the driver's oracle can certify the full
minhash/simhash/fingerprint pipelines value-for-value.

Everything is uint64 wraparound arithmetic over Unicode *codepoints* (not
UTF-8 bytes — SQL reaches codepoints via ``unicode(substr(...))``, numpy via
a vectorized UTF-32 decode):

- ``poly``      : word/text hash  h = Σ_i cp_i · C^i          (mod 2^64)
- ``splitmix64``: standard splitmix64 finisher (golden-ratio add + 2 mixes)
- ``fold``      : band combine    acc' = splitmix64((acc·C) ^ v)

The reference has no hashing of any kind (SURVEY.md §2.7); these primitives
back the engine-added training-data operators. xxhash64 (Spark-native) was
deliberately NOT used: DuckDB cannot evaluate it, which forced the round-1
near-dup queries into rows-only checks.

Case-folding caveat: the text pipelines lower-case BEFORE hashing, in each
engine's own ``lower()``. A sweep of codepoints U+0020..U+2FFF found exactly
two where Spark and DuckDB disagree — U+0130 'İ' (Spark → "i"+combining
dot, DuckDB → "i") and U+2C2F 'Ⱟ' (DuckDB doesn't fold) — so oracle parity
holds for all practical text but is not a Unicode-complete guarantee. The
hash layer itself is fuzz-tested engine-equal on arbitrary codepoints
(tests/test_xhash_property.py) with both sides fed the same folded words.
"""

from __future__ import annotations

import numpy as np

C = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
# Words are hashed over their first MAX_WORD_CP codepoints ONLY — the SQL
# mirror inlines a fixed C-power list of this size, and without a shared
# truncation bound a >256-codepoint token (URL, base64 blob) would hash
# differently in the two engines (the SQL side's out-of-range list index
# yields NULL terms that sum() silently drops). 256 cps covers any natural-
# language word; truncation only coarsens dedup granularity for machine
# tokens, never correctness.
MAX_WORD_CP = 256
PHI = np.uint64(0x9E3779B97F4A7C15)
M1 = np.uint64(0xBF58476D1CE4E5B9)
M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 arrays (any shape)."""
    x = (x + PHI).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= M1
    x ^= x >> np.uint64(27)
    x *= M2
    x ^= x >> np.uint64(31)
    return x


def pow_table(n: int) -> np.ndarray:
    """[C^0, C^1, …, C^(n-1)] mod 2^64 (cumprod wraps in uint64)."""
    t = np.full(n, C, dtype=np.uint64)
    t[0] = np.uint64(1)
    return np.cumprod(t, dtype=np.uint64)


def codepoints(s: str) -> np.ndarray:
    """Unicode codepoints of ``s`` as uint64, vectorized via UTF-32."""
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def word_hash_flat(words: list[str]) -> np.ndarray:
    """splitmix64(poly(word)) for a flat batch of words, fully vectorized:
    one UTF-32 decode of the concatenation + a segmented power-weighted sum
    (wraparound-safe via cumsum differences). Empty word → splitmix64(0).
    Codepoints at position ≥ :data:`MAX_WORD_CP` contribute nothing — the
    same truncation the SQL mirror applies (see MAX_WORD_CP note)."""
    n = len(words)
    if n == 0:
        return np.empty(0, np.uint64)
    cps = codepoints("".join(words))
    lens = np.fromiter((len(w) for w in words), np.int64, count=n)
    ends = np.cumsum(lens)
    starts = ends - lens
    pos = np.arange(len(cps), dtype=np.int64) - np.repeat(starts, lens)
    in_range = pos < MAX_WORD_CP
    pw = pow_table(min(int(pos.max()) + 1 if len(pos) else 1, MAX_WORD_CP))
    contrib = np.where(in_range, cps * pw[np.where(in_range, pos, 0)], np.uint64(0))
    csum = np.concatenate([np.zeros(1, np.uint64), np.cumsum(contrib, dtype=np.uint64)])
    return splitmix64((csum[ends] - csum[starts]).astype(np.uint64))


def fold_bands(sig_matrix: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) uint64 signatures → (n, bands) band hashes via the
    sequential fold acc' = splitmix64((acc·C) ^ v) over each band's values."""
    n, num_perm = sig_matrix.shape
    rpb = num_perm // bands
    mb = sig_matrix.reshape(n, bands, rpb)
    acc = np.zeros((n, bands), np.uint64)
    for j in range(rpb):
        acc = splitmix64((acc * C) ^ mb[:, :, j])
    return acc


def minhash_salts(num_perm: int, seed: int) -> np.ndarray:
    """Per-permutation salts: splitmix64(j · (2·seed+1)), j = 1..num_perm."""
    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1))
