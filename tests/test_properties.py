"""Property-based checks (SURVEY.md §5.4): invariants that must hold for
ANY input, verified with hypothesis-generated events plus the real
testdata.

  1. Repartitioning never changes query results (exchange ≠ semantics).
  2. Tumbling windows partition event time totally: every event lands in
     exactly one window, and window arithmetic matches the closed form.
  3. Watermark-delay monotonicity: on bounded input, a larger delay never
     emits MORE windows (later watermark closes fewer), and every emitted
     window matches the batch answer.
  4. Geohash encode/bbox inverse: decode(encode(p)) contains p.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from conftest import SF_DIR

from flink_stream_processing_refarch_spark.functions.geo import (
    geohash_bbox_py,
    geohash_encode_py,
)
from flink_stream_processing_refarch_spark.plans import taxi


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_repartition_invariance(spark):
    """Q1 results are identical under any repartitioning of the input —
    the exchange operators move rows, never semantics."""
    base = _rows(taxi.q1_pickup_count(spark, SF_DIR))
    from flink_stream_processing_refarch_spark.sources.trips import clean_trips
    from flink_stream_processing_refarch_spark.functions import geo
    from pyspark.sql import functions as F

    for n in (1, 7, 64):
        trips = clean_trips(spark, SF_DIR).repartition(n)
        trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
        got = _rows(
            trips.groupBy(
                F.window(F.timestamp_millis("dropoff_ms"), "10 minutes"),
                "location",
            )
            .agg(F.count("*").alias("pickup_count"))
            .filter(F.col("pickup_count") >= taxi.MIN_PICKUP_COUNT)
            .select(
                "location",
                "pickup_count",
                (F.unix_millis("window.end") - 1).alias("timestamp"),
            )
        )
        assert got == base, f"repartition({n}) changed results"


@given(ts_ms=st.integers(min_value=0, max_value=4_102_444_800_000))
@settings(max_examples=200, deadline=None)
def test_tumbling_window_totality(ts_ms: int):
    """Every epoch-ms timestamp belongs to exactly one epoch-aligned
    10-minute window, and the window bounds are the unique closed form."""
    w = 600_000
    start = ts_ms - ts_ms % w
    assert start <= ts_ms < start + w
    # uniqueness: any other aligned start violates the containment
    assert (start - w) + w <= ts_ms
    assert ts_ms < (start + w) + w


@given(
    lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
    lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
    precision=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_geohash_bbox_contains_point(lat, lon, precision):
    gh = geohash_encode_py(lat, lon, precision)
    assert len(gh) == precision
    lat_min, lat_max, lon_min, lon_max = geohash_bbox_py(gh)
    assert lat_min <= lat <= lat_max
    assert lon_min <= lon <= lon_max


def test_watermark_delay_monotonicity(spark, tmp_path):
    """On bounded input with delays d1 <= d2, the d2 run emits a SUBSET of
    windows (a later-held watermark closes fewer), and both agree with the
    batch answer on whatever they emit."""
    import json
    import os

    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.functions import geo
    from flink_stream_processing_refarch_spark.streaming import jobs

    out = str(tmp_path / "wire_mono")
    os.makedirs(out)
    base = {
        "type": "trip",
        "pickup_lat": 40.7566, "pickup_lon": -73.9863,
        "dropoff_lat": 40.7566, "dropoff_lon": -73.9863,
        "total_amount": 1.0,
    }
    with open(out + "/chunk-0.json", "w") as f:
        for i, minute in enumerate((1, 2, 12, 13, 25, 26, 45)):
            f.write(
                json.dumps(
                    dict(
                        base,
                        trip_id=i,
                        pickup_datetime="2024-01-01T00:00:00.000Z",
                        dropoff_datetime=f"2024-01-01T00:{minute:02d}:00.000Z",
                    )
                )
                + "\n"
            )

    def run(delay: str):
        trips = jobs.stream_trips_from_wire(spark, out, watermark_delay=delay)
        trips = geo.with_geohash(trips, "location", "pickup_lat", "pickup_lon", 6)
        agg = (
            trips.groupBy(F.window("dropoff_ts", "10 minutes"), "location")
            .agg(F.count("*").alias("pickup_count"))
            .select(
                "location",
                "pickup_count",
                (F.unix_millis("window.end") - 1).alias("timestamp"),
            )
        )
        return set(_rows(jobs._run_to_memory(agg)))

    r0 = run("0 seconds")
    r10 = run("10 minutes")
    r60 = run("60 minutes")
    assert r60 <= r10 <= r0, (r0, r10, r60)
    # no-loss sanity: the zero-delay run emitted all but the last window
    assert len(r0) == 3


@given(
    data=st.binary(min_size=0, max_size=300_000),
)
@settings(max_examples=30, deadline=None)
def test_snappy_framed_roundtrip_any_bytes(data):
    """5. The snappy framing codec round-trips ARBITRARY byte strings
    (multi-chunk once > 64 KiB) with CRC verification intact."""
    from flink_stream_processing_refarch_spark.sources.compression import (
        decode_snappy_framed,
        encode_snappy_framed,
    )

    assert decode_snappy_framed(encode_snappy_framed(data), verify=True) == data


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10**7), min_size=1, max_size=200
    ),
    n_splits=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=100, deadline=None)
def test_incremental_session_merge_equals_batch(ts, n_splits):
    """6. The sessionizer's incremental fold is order/batching-invariant:
    merging any chunking of the (sorted) event stream into open-session
    aggregates yields exactly the batch gaps-and-islands sessions."""
    from flink_stream_processing_refarch_spark.streaming.jobs import (
        _SESSION_GAP_US,
        _merge_sessions,
    )

    # batch gaps-and-islands reference
    s = sorted(ts)
    expected = []
    start = prev = s[0]
    n = 1
    for t in s[1:]:
        if t - prev >= _SESSION_GAP_US:
            expected.append([start, prev, n])
            start, n = t, 0
        prev = t
        n += 1
    expected.append([start, prev, n])

    # incremental: fold arbitrary contiguous chunks of the sorted stream
    # (watermark ordering guarantee), in order
    sessions: list[list[int]] = []
    k = max(1, len(s) // n_splits)
    for i in range(0, len(s), k):
        sessions = _merge_sessions(sessions, s[i : i + k])
    assert sessions == expected

    # and unordered single-batch arrival (within-batch disorder) too
    import random

    shuffled = list(ts)
    random.Random(42).shuffle(shuffled)
    assert _merge_sessions([], shuffled) == expected


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10**7),
        min_size=1,
        max_size=120,
    ),
    n_sess=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=100, deadline=None)
def test_merge_sessions_vectorized_path_equals_loop(ts, n_sess, seed):
    """6b. The numpy collapse the sessionizer takes for arrival batches
    >= _MERGE_VECTORIZE_MIN (r14: guide §4.2, hot-key straggler fix) is
    bit-identical to the pure-loop rule — same inputs through both
    branches, with and without pre-existing open sessions."""
    import random

    import numpy as np

    from flink_stream_processing_refarch_spark.streaming.jobs import (
        _MERGE_VECTORIZE_MIN,
        _SESSION_GAP_US,
        _merge_sessions,
    )

    rng = random.Random(seed)
    # pad past the vectorization threshold so the numpy branch runs
    big = list(ts) + [
        rng.randint(0, 10**7) for _ in range(_MERGE_VECTORIZE_MIN)
    ]

    def loop_merge(sessions, new_ts):
        items = [list(s) for s in sessions] + [
            [t, t, 1] for t in sorted(new_ts)
        ]
        if not items:
            return []
        items.sort(key=lambda s: (s[0], s[1]))
        out = [items[0]]
        for s, e, n in items[1:]:
            if s - out[-1][1] < _SESSION_GAP_US:
                out[-1][1] = max(out[-1][1], e)
                out[-1][2] += n
            else:
                out.append([s, e, n])
        return out

    sessions = []
    cur = 0
    for _ in range(n_sess):
        cur += rng.randint(_SESSION_GAP_US, 3 * _SESSION_GAP_US)
        ln = rng.randint(0, 2 * _SESSION_GAP_US)
        sessions.append([cur, cur + ln, rng.randint(1, 5)])
        cur += ln

    got = _merge_sessions(
        [list(s) for s in sessions], np.asarray(big, dtype=np.int64)
    )
    assert got == loop_merge(sessions, big)


# ---------------------------------------------------------------------------
# 5. Cross-engine integer sign codes: for ANY float32 vector, the Spark
#    (Arrow/numpy int64 matmul) band codes equal the DuckDB (list-fold
#    integer) codes bit-for-bit — the by-construction determinism claim
#    of the quantized embedding-LSH coding, fuzzed off the testdata.
# ---------------------------------------------------------------------------


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8.0,
                max_value=8.0,
                allow_nan=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_embedding_codes_cross_engine_bit_identical(spark, vecs):
    import duckdb as ddb
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from flink_stream_processing_refarch_spark.operators import dedup

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], schema
    )
    got = {
        r["vec_id"]: list(r["codes"])
        for r in sdf.select(
            "vec_id", dedup._emb_codes_udf()(F.col("embedding")).alias("codes")
        ).collect()
    }
    con = ddb.connect()
    con.register(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            }
        ),
    )
    bits = dedup._emb_bits_duck()
    rows = con.execute(
        f"""
        WITH eint AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT)) AS ei
          FROM embeddings)
        SELECT vec_id,
               list_transform(range(0, {dedup.EMB_BANDS}), b ->
                 CAST(bits[b * {dedup.EMB_BITS} + 1] AS INT) * 32
                 + bits[b * {dedup.EMB_BITS} + 2] * 16
                 + bits[b * {dedup.EMB_BITS} + 3] * 8
                 + bits[b * {dedup.EMB_BITS} + 4] * 4
                 + bits[b * {dedup.EMB_BITS} + 5] * 2
                 + bits[b * {dedup.EMB_BITS} + 6]) AS codes
        FROM (SELECT vec_id, {bits} AS bits FROM eint)
        """
    ).fetchall()
    expect = {vid: list(codes) for vid, codes in rows}
    assert got == expect


# ---------------------------------------------------------------------------
# 6. Same contract for the PQ encoder: for ANY float32 vector, the Spark
#    (numpy int64 broadcast) subspace codes equal the DuckDB
#    (list-fold integer argmin) codes bit-for-bit.
# ---------------------------------------------------------------------------


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8.0,
                max_value=8.0,
                allow_nan=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None)
def test_pq_codes_cross_engine_bit_identical(spark, vecs):
    import duckdb as ddb
    import pyarrow as pa
    from pyspark.sql import types as T

    from flink_stream_processing_refarch_spark.operators import similarity as sim

    # fixed books from the session testdata sample: both engines must
    # agree for ARBITRARY input vectors against the same codebook
    books = sim._pq_books_int(spark, SF_DIR)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], schema)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in sdf.select(
            "vec_id", sim._pq_codes_udf(books)("embedding").alias("codes")
        ).collect()
    }
    con = ddb.connect()
    con.register(
        "vecs",
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            }
        ),
    )
    bk = (
        "["
        + ", ".join(
            "[" + ", ".join(str(v) for cent in sub for v in cent) + "]"
            for sub in books
        )
        + "]"
    )
    # flat books[s+1] holds K*D ints: centroid k dim d at [k*D + d + 1]
    sd, k = sim.PQ_SUB_DIM, sim.PQ_K
    sub_d2 = (
        f"list_sum(list_transform(range(1, {sd} + 1), d -> "
        f"(ei[s * {sd} + d] - bk[s + 1][(kk - 1) * {sd} + d])"
        f" * (ei[s * {sd} + d] - bk[s + 1][(kk - 1) * {sd} + d])))"
    )
    dists = f"list_transform(range(1, {k} + 1), kk -> {sub_d2})"
    code_s = f"list_indexof({dists}, list_aggregate({dists}, 'min')) - 1"
    rows = con.execute(
        f"""
        WITH eint AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT)) AS ei
          FROM vecs),
        b AS (SELECT {bk} AS bk)
        SELECT vec_id,
               list_transform(range(0, {sim.PQ_SUBS}), s -> {code_s}) AS codes
        FROM eint CROSS JOIN b
        """
    ).fetchall()
    expect = {vid: list(codes) for vid, codes in rows}
    assert got == expect


# ---------------------------------------------------------------------------
# 7. Cross-engine ln-quantization bit-identity: for ANY exact integer
#    counts, each shared ln-quantized STAGE PIPELINE (DSIR lambda, KL
#    term, bigram-LM NLL — operators/selection.py) evaluates to the SAME
#    BIGINT in Spark and DuckDB. Since r09 the ln inside is the
#    deterministic expression tree of functions/detmath.py (correctly
#    rounded + - * / only), so this gate checks a by-construction
#    property rather than a libm agreement assumption — the r05 version
#    of this test found exactly that assumption failing in r08 (the
#    pinned @example below, judge-minimized: JVM Math.log and DuckDB's
#    libm ln disagree by 1 ulp precisely on a floor(x*1e9 + 0.5)
#    boundary), which is what forced the detmath fix.
# ---------------------------------------------------------------------------


_counts = st.integers(min_value=0, max_value=10**9)


@given(
    rows=st.lists(
        st.tuples(_counts, _counts, _counts, _counts),
        min_size=1,
        max_size=24,
    )
)
@example(rows=[(424080447, 111, 29683, 46597)])  # r08 judge counterexample
# detmath boundary pins: (1,0,0,0) puts lam's argument at exactly 2.0
# (the exponent-cascade comparison boundary) and nll's at exactly 1.5
# (the secondary-reduction threshold); (0,0,0,0) puts kl's at exactly
# 1.0 (ln = 0, the domain floor after the +1/+B smoothing)
@example(rows=[(1, 0, 0, 0), (0, 0, 0, 0), (2, 1, 1, 0)])
@settings(max_examples=25, deadline=None)
def test_ln_quantized_exprs_cross_engine_bit_identical(spark, rows):
    import duckdb as ddb
    import pyarrow as pa

    from flink_stream_processing_refarch_spark.functions import detmath
    from flink_stream_processing_refarch_spark.operators import selection

    cases = [
        # (stages, column names the stages consume, mapped from the
        #  tuple, per-column floor enforcing the operator's domain — for
        #  nll, v >= 1: the vocab is nonempty whenever the LM relation
        #  has a row, and the detmath ln's domain needs x > 0)
        (selection.lam_q_stages(), ("tc", "sc", "s_tot", "t_tot"),
         (0, 0, 0, 0), "lam_q"),
        (selection.kl_q_stages(), ("c_sb", "n_s", "c_b", "n_tot"),
         (0, 0, 0, 0), "kl_q"),
        (selection.nll_q_stages(), ("c1", "c2", "v", "unused"),
         (0, 0, 1, 0), "nll_q"),
    ]
    for stages, cols, lo, final in cases:
        data = {
            c: [max(lo[i], int(r[i])) for r in rows]
            for i, c in enumerate(cols)
        }
        sdf = spark.createDataFrame(
            list(zip(*[data[c] for c in cols])), schema=list(cols)
        )
        got = [
            r[0]
            for r in detmath.apply_stages(sdf, stages)
            .select(final)
            .collect()
        ]
        con = ddb.connect()
        con.register(
            "t", pa.table({c: pa.array(data[c], type=pa.int64()) for c in cols})
        )
        expect = [
            r[0]
            for r in con.execute(
                f"SELECT {final} FROM"
                f" ({detmath.stages_sql('SELECT * FROM t', stages)})"
            ).fetchall()
        ]
        assert got == expect, final


def test_ln_det_matches_math_log_to_1e_minus_12(spark):
    """The deterministic ln isn't just self-consistent — it's CORRECT:
    within 1e-12 relative of python math.log across the operators'
    whole argument domain (ratios of add-smoothed counts up to 1e9,
    spanning ~[2^-52, 2^52]), checked through the SPARK evaluation
    path."""
    import math

    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.functions import detmath

    xs = [2.0 ** k for k in range(-52, 53, 7)]
    xs += [3.5e-16, 1.0, 1.4999999999999998, 1.5, 2.718281828459045,
           424080448.0 * 46853.0 / (367.0 * 29684.0), 9.87e14]
    sdf = spark.createDataFrame([(x,) for x in xs], schema=["x"])
    rows = (
        detmath.apply_stages(sdf, detmath.ln_det_stages("x", "d"))
        .select("x", "d_ln")
        .collect()
    )
    assert len(rows) == len(xs)
    for r in rows:
        ref = math.log(r["x"])
        assert abs(r["d_ln"] - ref) <= 1e-12 * max(abs(ref), 1.0), r["x"]


def test_ann_pq_on_table_smaller_than_codebook(spark, tmp_path):
    """PQ_K=256 > table rows must degrade to a k_eff codebook (what
    exists), exactly like the oracle's LIMIT PQ_K — not IndexError
    (review finding r05). Oracle-compared on a 20-vector table."""
    import duckdb as ddb
    import pyarrow.parquet as pq_  # noqa: N813

    from flink_stream_processing_refarch_spark.operators import similarity as sim

    t = pq_.read_table(f"{SF_DIR}/embeddings.parquet").slice(0, 20)
    small = tmp_path / "sf_small"
    small.mkdir()
    pq_.write_table(t, str(small / "embeddings.parquet"))
    got = sorted(
        tuple(r) for r in sim.q_ann_pq(spark, str(small)).collect()
    )
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{small}/embeddings.parquet'"
    )
    expect = sorted(tuple(r) for r in con.execute(sim.ORACLES["ann_pq"]).fetchall())
    assert len(got) == len(expect) > 0
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1], (g, e)  # vec_id, adc_dist


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**4),   # tf
            st.integers(min_value=1, max_value=10**6),   # df
            st.integers(min_value=1, max_value=10**5),   # dl
            st.integers(min_value=0, max_value=10**6),   # n_docs extra over df
            st.integers(min_value=1, max_value=10**5),   # avgdl numerator
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=15, deadline=None)
def test_bm25_term_micros_cross_engine_bit_identical(spark, rows):
    """The shared BM25 per-term micro-unit stages (bm25_score AND
    bm25_topk_batch rank on the result) had the same ln() 1-ulp
    exposure as the selection trio; since r09 both walk the detmath
    staged ln, so this fuzz checks a by-construction property — through
    the REAL stage application on both engines (avgdl is a double, but
    derived as int/int so both engines construct the identical IEEE
    value)."""
    import duckdb as ddb
    import pyarrow as pa

    from flink_stream_processing_refarch_spark.functions import detmath
    from flink_stream_processing_refarch_spark.operators import retrieval

    stages = retrieval.bm25_term_stages()
    data = {
        "tf": [r[0] for r in rows],
        "df": [r[1] for r in rows],
        "dl": [r[2] for r in rows],
        "n_docs": [r[1] + r[3] for r in rows],
        "avgdl": [r[4] / 3.0 for r in rows],
    }
    cols = list(data)
    sdf = spark.createDataFrame(
        list(zip(*[data[c] for c in cols])), schema=cols
    )
    got = [
        r[0]
        for r in detmath.apply_stages(sdf, stages).select("ts_u").collect()
    ]
    con = ddb.connect()
    con.register(
        "t",
        pa.table(
            {
                c: pa.array(
                    data[c],
                    type=pa.float64() if c == "avgdl" else pa.int64(),
                )
                for c in cols
            }
        ),
    )
    expect = [
        r[0]
        for r in con.execute(
            "SELECT ts_u FROM"
            f" ({detmath.stages_sql('SELECT * FROM t', stages)})"
        ).fetchall()
    ]
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**4),   # tf
            st.integers(min_value=1, max_value=10**9),   # df
            st.integers(min_value=0, max_value=10**9),   # n_docs extra over df
        ),
        min_size=1,
        max_size=24,
    )
)
# boundary pins: df == n_docs puts the ln argument at exactly 1.0 (the
# domain floor, ln = 0 -> tfidf_u = 0); n_docs = 2*df puts it at exactly
# 2.0, the exponent-cascade comparison boundary
@example(rows=[(1, 5, 0), (3, 5, 5), (7, 1, 10**9 - 1)])
@settings(max_examples=15, deadline=None)
def test_tfidf_micros_cross_engine_bit_identical(spark, rows):
    """The shared TF-IDF per-(doc, term) micro-unit stages
    (tfidf_top_terms ranks AND emits the result) were the LAST raw libm
    ln in any oracle-hashed expression — the float_audit allowlist's one
    row until r10. Since the migration both engines walk the detmath
    staged ln, so this fuzz checks a by-construction property through
    the REAL stage application on both engines (same harness as the
    selection quartet and BM25 gates above)."""
    import duckdb as ddb
    import pyarrow as pa

    from flink_stream_processing_refarch_spark.functions import detmath
    from flink_stream_processing_refarch_spark.operators import corpus

    stages = corpus.tfidf_micro_stages()
    data = {
        "tf": [r[0] for r in rows],
        "doc_freq": [r[1] for r in rows],
        "n_docs": [r[1] + r[2] for r in rows],  # n_docs >= df, invariant
    }
    cols = list(data)
    sdf = spark.createDataFrame(
        list(zip(*[data[c] for c in cols])), schema=cols
    )
    got = [
        r[0]
        for r in detmath.apply_stages(sdf, stages).select("tfidf_u").collect()
    ]
    con = ddb.connect()
    con.register(
        "t", pa.table({c: pa.array(data[c], type=pa.int64()) for c in cols})
    )
    expect = [
        r[0]
        for r in con.execute(
            "SELECT tfidf_u FROM"
            f" ({detmath.stages_sql('SELECT * FROM t', stages)})"
        ).fetchall()
    ]
    assert got == expect


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_word_bucket_pipeline_cross_engine_on_arbitrary_text(spark, texts):
    """The words_expr -> md5_int60 -> bucket pipeline (feature_hashing's
    per-row path, and the hash discipline every text operator shares)
    must agree between engines on ARBITRARY unicode — empty strings,
    runs of spaces, astral-plane characters — not just the ASCII-ish
    oracle corpus. Compares the full exploded (doc, bucket, count)
    relation."""
    import duckdb as ddb
    import pyarrow as pa

    from flink_stream_processing_refarch_spark.functions.portable import (
        md5_int60,
        words_expr,
    )
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema=["doc_id", "text"]
    )
    got = sorted(
        tuple(r)
        for r in sdf.select(
            "doc_id",
            F.explode(F.expr(words_expr("text", "spark"))).alias("w"),
        )
        .select(
            "doc_id",
            F.expr(f"{md5_int60('w', 'spark')} % 64").alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .count()
        .collect()
    )
    con = ddb.connect()
    con.register(
        "t",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT doc_id, {md5_int60('w', 'duckdb')} % 64 AS bucket,
                   count(*) AS n
            FROM (SELECT doc_id, unnest({words_expr('text', 'duckdb')}) AS w
                  FROM t)
            GROUP BY doc_id, bucket
            """
        ).fetchall()
    )
    assert got == expect


def test_ln_det_at_100tb_scale_counts(spark):
    """The detmath domain claim at 100 TB: with the operators' own
    invariants enforced (a source's bucket count never exceeds its
    total, a bucket's count never exceeds the corpus), counts at
    1e13-1e14 — a 100 TB corpus — keep every ln argument well inside
    [2^-64, 2^64), and the quantized scores stay (a) bit-identical
    across engines and (b) accurate: the staged ln is within 1e-12
    relative of math.log at the extreme arguments those counts
    produce."""
    import math

    import duckdb as ddb
    import pyarrow as pa

    from flink_stream_processing_refarch_spark.functions import detmath
    from flink_stream_processing_refarch_spark.operators import selection

    T = 10**14  # ~100 TB of tokens
    # (c_sb, n_s, c_b, n_tot) rows at the domain's extremes under the
    # invariants c_sb <= n_s <= n_tot and c_sb <= c_b <= n_tot
    kl_rows = [
        (0, 110, 0, T),            # rare bucket, tiny source, huge corpus
        (110, 110, 110, T),        # source-exclusive bucket -> max ratio
        (0, T, T - 1, T),          # big source missing a stopword bucket
        (T // 256, T, T // 256, T),  # uniform
        (1, 1, 1, T),              # 1-token source
    ]
    data = {
        c: [r[i] for r in kl_rows]
        for i, c in enumerate(("c_sb", "n_s", "c_b", "n_tot"))
    }
    sdf = spark.createDataFrame(
        list(zip(*[data[c] for c in data])), schema=list(data)
    )
    staged = detmath.apply_stages(sdf, selection.kl_q_stages())
    got = staged.select("kl_x", "kl_ln", "kl_q").collect()
    con = ddb.connect()
    con.register(
        "t", pa.table({c: pa.array(v, type=pa.int64()) for c, v in data.items()})
    )
    exp = con.execute(
        "SELECT kl_x, kl_ln, kl_q FROM"
        f" ({detmath.stages_sql('SELECT * FROM t', selection.kl_q_stages())})"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    for r in got:
        assert 2.0 ** -64 <= r["kl_x"] < 2.0 ** 64  # domain holds
        ref = math.log(r["kl_x"])
        assert abs(r["kl_ln"] - ref) <= 1e-12 * max(abs(ref), 1.0)


# ---------------------------------------------------------------------------
# Corpus partition-key rendering (r12): the staged-swap protocol takes
# manifest-key <-> physical-dir agreement as load-bearing, so the pure
# rendering functions get algebraic properties over ARBITRARY values,
# not just the e2e fixtures (tests/test_corpus_io.py covers agreement
# with what Spark physically writes for a fixed hostile set).
# ---------------------------------------------------------------------------


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_hive_escape_roundtrip_and_dir_safety(v):
    """_hive_unescape(_hive_escape(v)) == v for any string, and the
    escaped token never contains a path separator, a glob
    metacharacter, or a control character — the properties the swap's
    os.path.join(out_dir, pkey) and compaction's file-count glob rely
    on."""
    from flink_stream_processing_refarch_spark.operators.corpus_io import (
        _hive_escape,
        _hive_unescape,
    )

    tok = _hive_escape(v)
    assert _hive_unescape(tok) == v
    assert "/" not in tok and "\\" not in tok
    assert "*" not in tok and "?" not in tok and "[" not in tok
    assert not any(ord(c) < 0x20 or ord(c) == 0x7F for c in tok)


@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=30)),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=300, deadline=None)
def test_pkey_parse_pkey_inverse(vals):
    """_parse_pkey(_pkey(row)) == the original value tuple for any mix
    of NULLs and arbitrary strings across 1-3 partition columns — the
    inverse pair recover_corpus/compaction use to go between manifest
    keys and value tuples."""
    from flink_stream_processing_refarch_spark.operators.corpus_io import (
        _parse_pkey,
        _pkey,
    )

    cols = tuple(f"c{i}" for i in range(len(vals)))
    row = dict(zip(cols, vals))
    pkey = _pkey(cols, row)
    assert _parse_pkey(cols, pkey) == tuple(vals)
    # exactly one 'col=' segment per partition column, in order
    assert [seg.split("=", 1)[0] for seg in pkey.split("/")] == list(cols)
