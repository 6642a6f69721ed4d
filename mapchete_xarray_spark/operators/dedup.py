"""Deduplication + text-analysis operators over the documents table —
the training-data-pipeline half of the engine.

Every operator is expressed as ONE engine-parameterized SQL text
(``engine='spark' | 'duckdb'``): Spark executes it via ``spark.sql``
(pure Catalyst — string/hash functions are all JVM built-ins, no
Python anywhere), DuckDB executes the same logical plan as the
oracle.  The only dialect differences go through tiny shims
(hex→int cast, xor).

Hashing is md5-based so both engines agree bit-for-bit:

    tok_hash(t) = int(md5(t)[:8], 16)          ∈ [0, 2^32)

Operators:
- minhash signatures (m permutations (a_i·h + b_i) mod p over the
  token set) and banded LSH near-dup pairs verified with exact
  token-set Jaccard,
- 32-bit SimHash + Hamming-distance pairs,
- character n-gram Jaccard pairs,
- winnowing-style block fingerprints (min token-3-gram hash per
  position block),
- stopword-vote language ID.

Scale notes (10^12 docs): signatures/fingerprints are per-doc maps —
embarrassingly parallel.  The LSH pair join is the shuffle: band
buckets are the join key, so only same-bucket docs meet (that is the
point of LSH); hot buckets (boilerplate dups) are exactly the salted
path of operators/skew.py.  The exact-verify stage joins only
candidate pairs.
"""

from __future__ import annotations

# deterministic permutation constants (public small primes; any fixed
# values work — they just must match between engines, which they do
# because both engines run this exact text)
MINHASH_P = 2147483647
MINHASH_COEFFS = [
    (1000003, 12345),
    (999983, 54321),
    (1000033, 777),
    (1000037, 31337),
    (1000039, 271828),
    (1000081, 141421),
    (1000099, 173205),
    (1000117, 223606),
    (1000121, 244948),
    (1000133, 264575),
    (1000151, 282842),
    (1000159, 300000),
]
# 2 bands x 6 rows: band-collision probability is s^6 (s = true
# Jaccard), which keeps candidate sets sane even on highly-similar
# corpora (3x4 banding melted down on the tiny-vocabulary synthetic
# docs: every doc collided with every doc)
N_BANDS = 2
ROWS_PER_BAND = 6
SIMHASH_BITS = 32


def _hex2int(engine: str, h: str) -> str:
    if engine == "spark":
        return f"cast(conv({h}, 16, 10) as bigint)"
    return f"cast(('0x' || {h}) as bigint)"


def _xor(engine: str, a: str, b: str) -> str:
    return f"({a} ^ {b})" if engine == "spark" else f"xor({a}, {b})"


def tok_hash_sql(engine: str, tok: str) -> str:
    return _hex2int(engine, f"substring(md5({tok}), 1, 8)")


def _tokens_cte(engine: str, table: str = "documents") -> str:
    """(doc_id, tok) — distinct tokens per doc (set semantics)."""
    if engine == "spark":
        exp = f"select doc_id, explode(split(text, ' ')) as tok from {table}"
    else:
        exp = f"select doc_id, unnest(string_split(text, ' ')) as tok from {table}"
    return f"select distinct doc_id, tok from ({exp}) raw where tok <> ''"


def minhash_signatures_sql(engine: str) -> str:
    """One row per doc: doc_id, mh00..mh11 (bigint)."""
    h = tok_hash_sql(engine, "tok")
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {MINHASH_P}) as mh{i:02d}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f"with toks as ({_tokens_cte(engine)}) select doc_id, {mins} from toks group by doc_id"


def lsh_band_sql(engine: str) -> str:
    """(doc_id, band, band_key) — md5 over each band's minhash run."""
    sig = minhash_signatures_sql(engine)
    selects = []
    for b in range(N_BANDS):
        cols = ", ".join(
            f"mh{b * ROWS_PER_BAND + r:02d}" for r in range(ROWS_PER_BAND)
        )
        selects.append(
            f"select doc_id, {b} as band, md5(concat_ws('-', {cols})) as band_key from sig"
        )
    return f"with sig as ({sig}) " + " union all ".join(selects)


def lsh_near_dup_pairs_sql(engine: str, jaccard_threshold: float = 0.8) -> str:
    """Candidate pairs from shared band buckets, refined with exact
    token-set Jaccard.  Output (doc_a, doc_b, jaccard)."""
    bands = lsh_band_sql(engine)
    toks = _tokens_cte(engine)
    return (
        f"with bands as ({bands}), toks as ({toks}), "
        f"sizes as (select doc_id, cast(count(*) as bigint) as n from toks group by doc_id), "
        f"cand as (select distinct b1.doc_id as doc_a, b2.doc_id as doc_b "
        f"from bands b1 join bands b2 on b1.band = b2.band and b1.band_key = b2.band_key "
        f"and b1.doc_id < b2.doc_id), "
        f"inter as (select c.doc_a, c.doc_b, cast(count(*) as bigint) as n_common "
        f"from cand c join toks ta on ta.doc_id = c.doc_a "
        f"join toks tb on tb.doc_id = c.doc_b and tb.tok = ta.tok "
        f"group by c.doc_a, c.doc_b) "
        f"select i.doc_a, i.doc_b, cast(round(cast(i.n_common as double) / "
        f"(sa.n + sb.n - i.n_common), 4) as double) as jaccard "
        f"from inter i join sizes sa on sa.doc_id = i.doc_a "
        f"join sizes sb on sb.doc_id = i.doc_b "
        f"where cast(i.n_common as double) / (sa.n + sb.n - i.n_common) >= {jaccard_threshold}"
    )


def simhash_sql(engine: str) -> str:
    """(doc_id, simhash) — 32-bit sign-vote SimHash over token hashes.
    Token multiplicity intentionally counts (standard SimHash uses
    term frequency as the weight)."""
    h = tok_hash_sql(engine, "tok")
    if engine == "spark":
        exp = "select doc_id, explode(split(text, ' ')) as tok from documents"
    else:
        exp = "select doc_id, unnest(string_split(text, ' ')) as tok from documents"
    bits = " + ".join(
        f"(case when sum(case when (({h}) >> {i}) % 2 = 1 then 1 else -1 end) > 0 "
        f"then cast({1 << i} as bigint) else 0 end)"
        for i in range(SIMHASH_BITS)
    )
    return (
        f"with rawtoks as ({exp}) "
        f"select doc_id, ({bits}) as simhash from rawtoks where tok <> '' group by doc_id"
    )


def simhash_pairs_sql(engine: str, max_hamming: int = 3) -> str:
    """Banded Hamming join: split the 32-bit simhash into 4 bytes; by
    pigeonhole, hamming(a,b) <= 3 forces at least one byte to match
    exactly, so candidates come from an EQUI-join on (band, byte) —
    no O(n^2) nested loop, zero recall loss — then the exact
    bit_count(xor) refine keeps true pairs."""
    sh = simhash_sql(engine)
    x = _xor(engine, "a.simhash", "b.simhash")
    n_bands = max_hamming + 1
    width = SIMHASH_BITS // n_bands
    keyed = " union all ".join(
        f"select doc_id, simhash, {b} as band, "
        f"(simhash >> {b * width}) & {(1 << width) - 1} as band_val from sh"
        for b in range(n_bands)
    )
    return (
        f"with sh as ({sh}), "
        f"keyed as ({keyed}), "
        f"cand as (select distinct a.doc_id as doc_a, a.simhash as sh_a, "
        f"b.doc_id as doc_b, b.simhash as sh_b "
        f"from keyed a join keyed b on a.band = b.band and a.band_val = b.band_val "
        f"and a.doc_id < b.doc_id) "
        f"select doc_a, doc_b, cast(bit_count({x.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')}) as int) as hamming "
        f"from cand a_b where bit_count({x.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')}) <= {max_hamming}"
    )


def ngram_sql(engine: str, n: int = 3) -> str:
    """(doc_id, gram) — distinct character n-grams."""
    if engine == "spark":
        gen = (
            f"select doc_id, substring(text, pos, {n}) as gram "
            f"from (select doc_id, text, explode(sequence(1, length(text) - {n - 1})) as pos "
            f"from documents where length(text) >= {n})"
        )
    else:
        gen = (
            f"select doc_id, substring(text, cast(pos as int), {n}) as gram "
            f"from (select doc_id, text, unnest(generate_series(1, length(text) - {n - 1})) as pos "
            f"from documents where length(text) >= {n}) g"
        )
    return f"select distinct doc_id, gram from ({gen}) gg"


def ngram_jaccard_pairs_sql(engine: str, threshold: float = 0.55) -> str:
    """Exact n-gram Jaccard pairs, prefiltered to same-lang docs with
    comparable length (|len_a - len_b| small) — the classic blocked
    exact-similarity join."""
    grams = ngram_sql(engine)
    return (
        f"with grams as ({grams}), "
        f"meta as (select doc_id, lang, n_chars from documents), "
        f"sizes as (select doc_id, cast(count(*) as bigint) as n from grams group by doc_id), "
        f"block as (select a.doc_id as doc_a, b.doc_id as doc_b "
        f"from meta a join meta b on a.lang = b.lang and a.doc_id < b.doc_id "
        f"and abs(a.n_chars - b.n_chars) <= 16), "
        f"inter as (select p.doc_a, p.doc_b, cast(count(*) as bigint) as n_common "
        f"from block p join grams ga on ga.doc_id = p.doc_a "
        f"join grams gb on gb.doc_id = p.doc_b and gb.gram = ga.gram "
        f"group by p.doc_a, p.doc_b) "
        f"select i.doc_a, i.doc_b, cast(round(cast(i.n_common as double) / "
        f"(sa.n + sb.n - i.n_common), 4) as double) as jaccard "
        f"from inter i join sizes sa on sa.doc_id = i.doc_a "
        f"join sizes sb on sb.doc_id = i.doc_b "
        f"where cast(i.n_common as double) / (sa.n + sb.n - i.n_common) >= {threshold}"
    )


def fingerprint_blocks_sql(engine: str, block: int = 8) -> str:
    """Winnowing-style fingerprints: min token-hash per block of
    ``block`` consecutive token positions → (doc_id, block_id, fp)."""
    h = tok_hash_sql(engine, "tok")
    if engine == "spark":
        exp = (
            "select doc_id, pos, tok from (select doc_id, "
            "posexplode(split(text, ' ')) as (pos, tok) from documents) raw where tok <> ''"
        )
    else:
        exp = (
            "select doc_id, cast(generate_subscripts(string_split(text, ' '), 1) as bigint) - 1 as pos, "
            "unnest(string_split(text, ' ')) as tok from documents"
        )
        exp = f"select * from ({exp}) raw where tok <> ''"
    return (
        f"with ptoks as ({exp}) "
        f"select doc_id, cast(floor(pos / {block}) as bigint) as block_id, "
        f"min({h}) as fp from ptoks group by doc_id, 2"
    )


LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "und", "die", "das", "ist"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}


def lang_id_sql(engine: str) -> str:
    """Stopword-vote language ID (n-gram-free heuristic): the language
    with the most stopword hits wins; ties and zero hits → 'und'
    (undetermined).  Deterministic tie-break by language code."""
    if engine == "spark":
        exp = "select doc_id, explode(split(text, ' ')) as tok from documents"
    else:
        exp = "select doc_id, unnest(string_split(text, ' ')) as tok from documents"
    votes = ", ".join(
        f"sum(case when tok in {tuple(words)!r} then 1 else 0 end) as v_{lang}"
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    langs = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"v_{l}" for l in langs) + ")"
    pick = "case " + " ".join(
        f"when v_{l} = {best} and {best} > 0 then '{l}'" for l in langs
    ) + " else 'und' end"
    return (
        f"with toks as ({exp}) , votes as ("
        f"select doc_id, {votes} from toks group by doc_id) "
        f"select doc_id, {pick} as lang_pred from votes"
    )
