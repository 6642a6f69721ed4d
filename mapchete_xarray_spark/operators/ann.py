"""Similarity search over the embeddings table (array<float>, 64-d).

Two paths, same engine-parameterized-SQL design as dedup.py:

- ``ann_topk_sql``: exact brute-force cosine top-k — the correctness
  baseline.  The dot product is relational: posexplode the vectors,
  equi-join on the component index, sum the products (Catalyst hash
  join + partial agg; zero Python).  Cosines are rounded to 6 dp
  *before* ranking so Spark and the DuckDB oracle rank identically.
- ``lsh_bucket_sql`` / ``ann_topk_lsh``: the scale path — 12
  md5-derived random-hyperplane sign bits bucket the vectors; top-k
  runs only within a query's bucket.  At 10^12 rows the bucket id is
  the shuffle key (same skew discipline as tile cells); recall vs
  brute force is measured in tests/test_dedup_ann.py.

Why relational dot product and not a pandas UDF: at 64 dims the
component join is ~64 rows/vector through codegen — no Arrow
round-trip, no Python worker pool, and Catalyst reorders/broadcasts
it like any other join.  (For 1k+ dims an Arrow-batched UDF wins;
that variant is ``cosine_topk_pandas`` below, used by the LSH refine.)
"""

from __future__ import annotations

N_PLANES = 12


def _hex2int(engine: str, h: str) -> str:
    if engine == "spark":
        return f"cast(conv({h}, 16, 10) as bigint)"
    return f"cast(('0x' || {h}) as bigint)"


def flat_sql(engine: str, table: str = "embeddings") -> str:
    """(vec_id, i, x:double) — component-indexed flattening."""
    if engine == "spark":
        return (
            f"select vec_id, pos as i, cast(x as double) as x "
            f"from (select vec_id, posexplode(embedding) as (pos, x) from {table})"
        )
    return (
        f"select vec_id, generate_subscripts(embedding, 1) - 1 as i, "
        f"cast(unnest(embedding) as double) as x from {table}"
    )


def ann_topk_sql(engine: str, k: int = 3, n_queries: int = 20) -> str:
    """Exact cosine top-k of every vec_id < n_queries against all
    others.  Output (qid, vec_id, cosine, rn)."""
    flat = flat_sql(engine)
    return (
        f"with flat as ({flat}), "
        f"norms as (select vec_id, sqrt(sum(x * x)) as nrm from flat group by vec_id), "
        f"dots as (select q.vec_id as qid, d.vec_id as did, sum(q.x * d.x) as dot "
        f"from flat q join flat d on q.i = d.i and q.vec_id < {n_queries} "
        f"and d.vec_id <> q.vec_id group by q.vec_id, d.vec_id), "
        f"cos as (select dots.qid, dots.did, "
        f"cast(round(dot / (nq.nrm * nd.nrm), 6) as double) as cosine "
        f"from dots join norms nq on nq.vec_id = dots.qid "
        f"join norms nd on nd.vec_id = dots.did), "
        f"ranked as (select qid, did as vec_id, cosine, "
        f"row_number() over (partition by qid order by cosine desc, did asc) as rn from cos) "
        f"select qid, vec_id, cosine, cast(rn as int) as rn from ranked where rn <= {k}"
    )


def lsh_bucket_sql(engine: str, n_planes: int = N_PLANES, n_tables: int = 1) -> str:
    """(vec_id, tbl, bucket) — random-hyperplane signatures for
    ``n_tables`` independent tables (OR-amplification: a candidate
    pair only needs to collide in ONE table, the standard recall
    lever for sign-LSH).  Plane (t, j)'s component i is ±1 from
    md5(t*1000+j||'-'||i): deterministic, identical in both engines,
    no RNG state anywhere."""
    flat = flat_sql(engine)
    key = "cast(t * 1000 + j as string)" if engine == "spark" else "cast(t * 1000 + j as varchar)"
    istr = "cast(i as string)" if engine == "spark" else "cast(i as varchar)"
    hfun = "substring" if engine == "spark" else "substr"
    plane = _hex2int(engine, f"{hfun}(md5(concat({key}, '-', {istr})), 1, 8)")
    if engine == "spark":
        planes = (
            f"select t, explode(sequence(0, {n_planes - 1})) as j "
            f"from (select explode(sequence(0, {n_tables - 1})) as t)"
        )
    else:
        planes = (
            f"select t.t, j.j from (select unnest(generate_series(0, {n_tables - 1})) as t) t, "
            f"(select unnest(generate_series(0, {n_planes - 1})) as j) j"
        )
    return (
        f"with flat as ({flat}), planes as ({planes}), "
        f"proj as (select f.vec_id, p.t, p.j, "
        f"sum(f.x * (({plane}) % 2 * 2 - 1)) as s "
        f"from flat f cross join planes p group by f.vec_id, p.t, p.j), "
        f"bits as (select vec_id, t as tbl, sum(case when s > 0 then cast(pow(2, j) as bigint) else 0 end) as bucket "
        f"from proj group by vec_id, t) select vec_id, tbl, bucket from bits"
    )


def ann_topk_lsh_sql(
    engine: str,
    k: int = 3,
    n_queries: int = 20,
    n_planes: int = N_PLANES,
    n_tables: int = 1,
) -> str:
    """Approximate top-k: exact cosine ranking restricted to the
    union of the query's buckets across ``n_tables`` tables.  Tune
    n_planes ≈ log2(n_vectors / bucket size) for selectivity and
    n_tables up for recall (OR-amplification)."""
    flat = flat_sql(engine)
    buckets = lsh_bucket_sql(engine, n_planes, n_tables)
    return (
        f"with flat as ({flat}), b as ({buckets}), "
        f"norms as (select vec_id, sqrt(sum(x * x)) as nrm from flat group by vec_id), "
        f"cand as (select distinct bq.vec_id as qid, bd.vec_id as did "
        f"from b bq join b bd on bq.tbl = bd.tbl and bq.bucket = bd.bucket "
        f"and bq.vec_id < {n_queries} and bd.vec_id <> bq.vec_id), "
        f"dots as (select c.qid, c.did, sum(q.x * d.x) as dot "
        f"from cand c join flat q on q.vec_id = c.qid "
        f"join flat d on d.vec_id = c.did and d.i = q.i "
        f"group by c.qid, c.did), "
        f"cos as (select dots.qid, dots.did, "
        f"cast(round(dot / (nq.nrm * nd.nrm), 6) as double) as cosine "
        f"from dots join norms nq on nq.vec_id = dots.qid "
        f"join norms nd on nd.vec_id = dots.did), "
        f"ranked as (select qid, did as vec_id, cosine, "
        f"row_number() over (partition by qid order by cosine desc, did asc) as rn from cos) "
        f"select qid, vec_id, cosine, cast(rn as int) as rn from ranked where rn <= {k}"
    )


def cosine_pairs_sql(engine: str, threshold: float = 0.4) -> str:
    """Exact embedding near-dup pairs: all (a < b) with cosine >=
    threshold.  Relational dot product over the component index; the
    scale path swaps the all-pairs join for the LSH bucket join of
    ``ann_topk_lsh_sql`` (same refine)."""
    flat = flat_sql(engine)
    return (
        f"with flat as ({flat}), "
        f"norms as (select vec_id, sqrt(sum(x * x)) as nrm from flat group by vec_id), "
        f"dots as (select a.vec_id as vec_a, b.vec_id as vec_b, sum(a.x * b.x) as dot "
        f"from flat a join flat b on a.i = b.i and a.vec_id < b.vec_id "
        f"group by a.vec_id, b.vec_id) "
        f"select vec_a, vec_b, cast(round(dot / (na.nrm * nb.nrm), 6) as double) as cosine "
        f"from dots join norms na on na.vec_id = vec_a "
        f"join norms nb on nb.vec_id = vec_b "
        f"where dot / (na.nrm * nb.nrm) >= {threshold}"
    )


def cosine_topk_pandas(data, queries, k: int, id_col="vec_id", vec_col="embedding"):
    """Arrow-batched exact top-k for high-dim vectors: the query
    matrix is broadcast, each data batch does one numpy matmul.
    Returns (qid, vec_id, cosine, rn)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    q_pdf = queries.select(id_col, vec_col).toPandas()
    qm = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qids = q_pdf[id_col].to_numpy()
    bc = data.sparkSession.sparkContext.broadcast((qm, qn, qids))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def run(batches):
        qm, qn, qids = bc.value
        for b in batches:
            dm = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            dn = np.linalg.norm(dm, axis=1, keepdims=True)
            cos = (qm @ dm.T) / (qn @ dn.T)
            n_q, n_d = cos.shape
            out = pd.DataFrame(
                {
                    "qid": np.repeat(qids, n_d),
                    "vec_id": np.tile(b[id_col].to_numpy(), n_q),
                    "cosine": cos.ravel(),
                }
            )
            yield out[out.qid != out.vec_id]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    allp = data.select(id_col, vec_col).mapInPandas(run, schema)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        allp.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .withColumn("rn", F.col("rn").cast("int"))
    )
