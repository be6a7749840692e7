"""Property-based tests (hypothesis) for the subtle operators: resample
invariants and as-of join semantics hold for arbitrary generated series."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financedatabase_spark.operators.joins import asof_join
from financedatabase_spark.operators.resample import resample

BASE = dt.datetime(2024, 3, 4, 9, 30)

ticks_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3600 * 8),  # seconds offset
        st.floats(min_value=1.0, max_value=500.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ticks=ticks_strategy)
def test_resample_invariants(spark_h, ticks):
    rows = [
        (i, BASE + dt.timedelta(seconds=s), float(v), float(v), float(v), float(v), 1)
        for i, (s, v) in enumerate(ticks)
    ]
    df = spark_h.createDataFrame(
        rows, "event_id long, ts timestamp, open double, high double, low double, close double, volume long"
    )
    bars = resample(
        df, "5m", ts_col="ts", key_cols=[], order_cols=["event_id"], fill_gaps=True
    ).toPandas()
    # volume conservation: gap buckets add zeros, never rows
    assert bars.volume.sum() == len(ticks)
    # high/low bracket every bucket's open/close on non-empty buckets
    ne = bars[bars.volume > 0]
    assert (ne.high >= ne.low).all()
    assert ((ne.open <= ne.high) & (ne.open >= ne.low)).all()
    assert ((ne.close <= ne.high) & (ne.close >= ne.low)).all()
    # grid completeness: buckets are contiguous at 5-minute steps
    ts_sorted = bars.ts.sort_values().reset_index(drop=True)
    if len(ts_sorted) > 1:
        deltas = ts_sorted.diff().dropna().unique()
        assert all(d == pd.Timedelta(minutes=5) for d in deltas)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_offsets=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    right_offsets=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
)
def test_asof_join_matches_pandas_merge_asof(spark_h, left_offsets, right_offsets):
    left_rows = [(i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(left_offsets))]
    right_rows = [
        (BASE + dt.timedelta(seconds=s), float(s)) for s in sorted(right_offsets)
    ]
    left = spark_h.createDataFrame(left_rows, "id long, ts timestamp")
    right = spark_h.createDataFrame(right_rows, "ts timestamp, rv double")
    got = (
        asof_join(left, right, on="ts", by=[], value_cols=["rv"])
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        pd.DataFrame(left_rows, columns=["id", "ts"]).sort_values("ts"),
        pd.DataFrame(right_rows, columns=["ts", "rv"]),
        on="ts",
        direction="backward",
    ).sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["rv"], want["rv"], check_names=False)


def test_asof_tolerance(spark_h):
    left = spark_h.createDataFrame(
        [(1, dt.datetime(2024, 1, 10)), (2, dt.datetime(2024, 1, 20))], "id long, ts timestamp"
    )
    right = spark_h.createDataFrame(
        [(dt.datetime(2024, 1, 9), 9.0)], "ts timestamp, rv double"
    )
    got = (
        asof_join(left, right, on="ts", by=[], value_cols=["rv"], tolerance="2 days")
        .toPandas()
        .set_index("id")
    )
    assert got.loc[1, "rv"] == 9.0  # within 2 days
    assert pd.isna(got.loc[2, "rv"])  # 11 days stale → nulled


@pytest.fixture(scope="module")
def spark_h(spark):
    return spark


def test_lsh_mass_duplication_stays_linear(spark_h):
    """Adversarial skew: 100k copies of one document collide on every band
    key. All-pairs would emit ~5e9 candidates; the hot-bucket star cap
    must emit exactly n-1 pairs against the representative, all verified
    at jaccard 1.0, in time linear in n (a quadratic blowup would not
    finish this test at all)."""
    import time

    from pyspark.sql import functions as F

    from financedatabase_spark.operators.dedup_docs import minhash_lsh_dedup

    n = 100_000
    docs = spark_h.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again").alias("text"),
    )
    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup(docs, threshold=0.999)
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - t0
    assert n_pairs == n - 1  # star, not clique
    agg = pairs.agg(
        F.min("jaccard").alias("jmin"), F.countDistinct("doc1").alias("reps")
    ).collect()[0]
    assert agg.jmin == 1.0
    assert agg.reps == 1  # single representative anchors the star
    # generous wall-clock bound: quadratic candidate generation would need
    # ~5e9 pair evaluations and blow far past this
    assert elapsed < 300, f"LSH skew path took {elapsed:.0f}s — not linear"


def test_dataset_split_partitions_exactly(spark_h):
    """Splits must PARTITION the input: every row lands in exactly one
    split, observed proportions track the spec, and re-running (or
    repartitioning) never moves a row — the md5-interval assignment is a
    pure function of the key."""
    from pyspark.sql import functions as F

    from financedatabase_spark.operators.sampling import dataset_split

    df = spark_h.range(20_000).select(F.col("id").alias("doc_id"))
    spec = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = dataset_split(df, spec)
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20_000  # partition, no loss/dup
    for name, frac in spec.items():
        assert abs(counts[name] / 20_000 - frac) < 0.02, (name, counts)

    b = dataset_split(df.repartition(13), spec)
    moved = (
        a.select("doc_id", F.col("split").alias("s1"))
        .join(b.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("s1") != F.col("s2"))
        .count()
    )
    assert moved == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1, max_size=120,
    ),
    chunk=st.integers(min_value=1, max_value=40),
    alpha=st.floats(min_value=0.01, max_value=0.99),
)
def test_chunked_ewma_equals_whole_series_property(spark_h, vals, chunk, alpha):
    """For ARBITRARY series, chunk spans, and alphas, the chunked
    carry-forward fold is bit-identical to the whole-series fold —
    including single-element chunks and chunk == series length."""
    from financedatabase_spark.operators.smoothing import ewma_last, ewma_last_chunked

    df = spark_h.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, x double"
    ).withColumn("k", F.lit("only"))
    want = ewma_last(df, alpha, ["k"], "i", "x").first()
    got = ewma_last_chunked(
        df, alpha, ["k"], "i", "x", chunk_expr=F.floor(F.col("i") / chunk)
    ).first()
    assert (got.ewma_value, got.n) == (want.ewma_value, want.n)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=2, max_value=40),
    dim=st.integers(min_value=2, max_value=8),
    block=st.integers(min_value=1, max_value=50),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_blocked_near_dups_equals_fold_property(spark_h, n, dim, block, seed):
    """For random vector sets and ANY block size (1 row per block up to
    no split at all), the block-pair cogrouped scorer emits exactly the
    fold baseline's pair set and scores."""
    import numpy as np

    from financedatabase_spark.operators.similarity import embedding_near_dups

    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, dim)], int(i % 3)) for i in range(n)
    ]
    df = spark_h.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    want = sorted(map(tuple, embedding_near_dups(df, threshold=0.2, vectorized=False).collect()))
    got = sorted(
        map(tuple, embedding_near_dups(df, threshold=0.2, block_rows=block).collect())
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 5),      # group
            st.integers(0, 30),     # node a (namespaced per group below)
            st.integers(0, 30),     # node b
        ),
        min_size=1,
        max_size=80,
    ),
)
def test_grouped_components_equals_reference_uf(spark_h, edges):
    """Property: for ANY multigraph partitioned by a group key (nodes
    namespaced per group so edges cannot cross), grouped_components
    equals a sequential union-find — including self-loops, parallel
    edges, and long chains that force multi-hop path compression."""
    from financedatabase_spark.operators.dedup_docs import grouped_components

    # namespace nodes per group: node id = group * 1000 + local id
    rows = [(g, g * 1000 + a, g * 1000 + b) for g, a, b in edges]

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark_h.createDataFrame(rows, "grp long, doc1 long, doc2 long")
    got = {
        r.doc_id: r.cluster_rep
        for r in grouped_components(df, "grp").collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.integers(0, 3_000_000), min_size=1, max_size=60),
    ivs=st.lists(
        st.tuples(st.integers(0, 3_000_000), st.integers(0, 400_000)),
        min_size=1, max_size=25,
    ),
    bucket=st.integers(min_value=1, max_value=200_000),
)
def test_interval_join_equals_bruteforce_property(spark_h, pts, ivs, bucket):
    """For arbitrary points, intervals, and bucket sizes (down to 1s
    buckets forcing huge explode factors), the bucketed interval join
    must produce exactly the brute-force BETWEEN pair set."""
    import datetime as dt

    from financedatabase_spark.operators.joins import interval_join

    base = dt.datetime(2024, 1, 1)
    p = spark_h.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(pts)],
        "pid int, ts timestamp",
    )
    iv = spark_h.createDataFrame(
        [(j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
         for j, (s, d) in enumerate(ivs)],
        "iid int, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(p, iv, "ts", "s", "e", bucket_seconds=bucket).collect()
    )
    want = sorted(
        (i, j)
        for i, sp in enumerate(pts)
        for j, (s, d) in enumerate(ivs)
        if s <= sp <= s + d
    )
    assert got == want


def test_winnow_hash_modes_flag_same_pairs(spark_h):
    """The xxhash64 scale path and the md5 oracle path select different
    window minima, but the winnowing guarantee (any shared w+k-1-word
    run shares a fingerprint) holds under any hash — so on a corpus
    whose true overlaps are well-separated from the min_shared
    threshold, both modes must flag exactly the planted pair set."""
    import numpy as np

    from financedatabase_spark.operators.text import (
        winnow_fingerprint_set,
        winnow_overlap_pairs,
    )

    rng = np.random.default_rng(17)
    passages = [
        " ".join(f"p{p}w{rng.integers(0, 1_000_000)}" for _ in range(40))
        for p in range(3)
    ]
    docs = []
    for i in range(24):
        own = " ".join(f"d{i}u{j}" for j in range(30))  # disjoint per-doc vocab
        if i < 6:  # docs 0-5 embed passage i//2 -> planted pairs (0,1) (2,3) (4,5)
            words = own.split()
            cut = int(rng.integers(5, 25))
            docs.append((i, " ".join(words[:cut]) + " " + passages[i // 2] + " "
                         + " ".join(words[cut:])))
        else:
            docs.append((i, own))
    df = spark_h.createDataFrame(docs, "doc_id int, text string")
    planted = [(0, 1), (2, 3), (4, 5)]
    for mode in ("md5", "xxhash64"):
        got = sorted(
            (r.doc1, r.doc2)
            for r in winnow_overlap_pairs(df, hash_mode=mode).collect()
        )
        assert got == planted, mode
    # type contract: xxhash64 fingerprints are BIGINT (primitive compares)
    row = df.limit(1).select(
        winnow_fingerprint_set("text", hash_mode="xxhash64").alias("fp")
    )
    assert dict(row.dtypes)["fp"] == "array<bigint>"


@given(
    pixels=st.lists(
        st.lists(st.integers(0, 255), min_size=1, max_size=24),
        min_size=1,
        max_size=24,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1),
    filters=st.data(),
)
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_png_roundtrip_any_geometry_any_filters(pixels, filters):
    """Property: for ANY grayscale pixel grid and ANY per-row filter
    choice, a PNG written with properly computed filter deltas decodes
    back to the exact source histogram — the un-filter implementation
    (Sub/Up/Average/Paeth inverse, mod-256) is total, not
    fixture-shaped."""
    import struct
    import zlib

    from financedatabase_spark.operators.multimodal import (
        _paeth,
        _png_chunk,
        png_decode,
    )

    h, w = len(pixels), len(pixels[0])
    fts = [filters.draw(st.integers(0, 4)) for _ in range(h)]
    raw = bytearray()
    for y, row in enumerate(pixels):
        ft = fts[y]
        raw.append(ft)
        prior = pixels[y - 1] if y > 0 else [0] * w
        for x, v in enumerate(row):
            left = row[x - 1] if x > 0 else 0
            up = prior[x]
            ul = prior[x - 1] if x > 0 else 0
            f = (
                v if ft == 0
                else v - left if ft == 1
                else v - up if ft == 2
                else v - (left + up) // 2 if ft == 3
                else v - _paeth(left, up, ul)
            )
            raw.append(f % 256)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    counts = [0] * 8
    for row in pixels:
        for v in row:
            counts[v * 8 // 256] += 1
    assert png_decode(png) == [c / (w * h) for c in counts]


@given(
    doc_id=st.integers(0, 2**31 - 1),
    dim=st.integers(1, 16),
)
@settings(max_examples=25, deadline=None)
def test_media_codecs_roundtrip_any_doc_id(doc_id, dim):
    """Property: the three synth->decode pairs are exact for any doc_id
    and any feature dimension — windowing/binning math has no edge cases
    at id boundaries."""
    from financedatabase_spark.operators.multimodal import (
        avi_decode,
        png_decode,
        synth_avi,
        synth_png,
        wav_decode,
        synth_wav,
    )

    n = 400 + doc_id % 257
    want_w = [0.0] * dim
    for t in range(n):
        # per-variant fixture formula (doc%8): 16-bit mono / 16-bit
        # stereo mono-mixed truncating toward zero / unsigned 8-bit /
        # 24-bit / 32-bit / float32 (dyadic, exact) / G.711 mu-law
        x = doc_id * 7919 + t * 104729
        if doc_id % 8 == 1:
            left = (x % 65536) - 32768
            right = ((doc_id * 104729 + t * 7919) % 65536) - 32768
            a = abs(int((left + right) / 2))
        elif doc_id % 8 == 2:
            a = abs((x % 256) - 128)
        elif doc_id % 8 == 4:
            a = abs((x % 2**24) - 2**23)
        elif doc_id % 8 == 5:
            a = abs((x % 2**32) - 2**31)
        elif doc_id % 8 == 6:
            a = abs((x % 65536) - 32768) / 32768.0
        elif doc_id % 8 == 7:
            u = 255 - x % 256
            a = ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
        else:
            a = abs((x % 65536) - 32768)
        want_w[t * dim // n] += a
    assert wav_decode(synth_wav(doc_id), dim=dim) == [float(v) for v in want_w]

    nf = 8 + doc_id % 5
    want_v = [0] * dim
    for f in range(nf):
        s = sum(
            (doc_id * 31 + f * 97 + y * 13 + x * 7 + c * 5) % 256
            for y in range(16) for x in range(16) for c in range(3)
        )
        want_v[f * dim // nf] += s
    assert avi_decode(synth_avi(doc_id), dim=dim) == [float(v) for v in want_v]

    w = 8 + (doc_id % 3) * 4
    counts = [0] * dim
    for y in range(16):
        for x in range(w):
            counts[((doc_id * 17 + y * 31 + x * 7) % 256) * dim // 256] += 1
    assert png_decode(synth_png(doc_id), dim=dim) == [c / (w * 16) for c in counts]


@given(
    data=st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=4000),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_round_trip_property(data):
    """GIF LZW (LSB-first, late width change) is lossless for arbitrary
    byte sequences — including adversarial low-entropy runs hypothesis
    shrinks toward."""
    from financedatabase_spark.operators.gif import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


@given(
    data=st.binary(min_size=1, max_size=4000),
)
@settings(max_examples=60, deadline=None)
def test_tiff_lzw_round_trip_property(data):
    """TIFF LZW (MSB-first, EARLY width change) is lossless for
    arbitrary byte strings — the property that pins the
    one-entry-early decoder width bump against the encoder's."""
    from financedatabase_spark.operators.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data
