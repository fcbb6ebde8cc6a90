"""Property-based tests (SURVEY.md §5.4) — hypothesis over the
incremental-load operator core. Small example counts: each example round-
trips through Spark."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cs_tutorial_reporting_spark.operators.incremental import (
    dedup_against,
    incremental_filter,
    watermark,
)

T0 = dt.datetime(2024, 1, 1)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # key
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=10_000).map(
                lambda s: T0 + dt.timedelta(seconds=s)
            ),
        ),
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, split=st.integers(min_value=0, max_value=50))
def test_incremental_contract(spark, rows, split):
    df = spark.createDataFrame(rows, "k int, ts timestamp") if rows else (
        spark.createDataFrame([], "k int, ts timestamp")
    )
    existing = df.filter(f"k < {split}").cache()
    wm = watermark(existing, "ts")

    delta = dedup_against(
        incremental_filter(df, "ts", wm), existing, ["k"]
    ).collect()

    existing_keys = {r.k for r in existing.collect()}
    # 1. no loaded key collides with an existing key
    assert all(r.k not in existing_keys for r in delta)
    # 2. every loaded row is strictly after the watermark (NULLs never load)
    if wm is not None:
        assert all(r.ts is not None and r.ts > wm for r in delta)
    # 3. watermark monotonicity: max over union never decreases
    new_state = existing.unionByName(
        spark.createDataFrame(delta, "k int, ts timestamp")
        if delta
        else existing.filter("1=0")
    )
    wm2 = watermark(new_state, "ts")
    assert wm is None or (wm2 is not None and wm2 >= wm)


@given(
    pcm=st.binary(min_size=0, max_size=2048),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=2),
    width=st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_wav_container_roundtrip_property(pcm, rate, channels, width):
    """Any payload round-trips the RIFF builder/parser with frame math
    intact: n_samples = len(pcm) // (channels * width), duration is
    integer ms at the declared rate (pure-Python codec — no Spark)."""
    from cs_tutorial_reporting_spark.multimodal.wav import decode_wav, wav_bytes

    feats = decode_wav(wav_bytes(pcm, sample_rate=rate, channels=channels, sampwidth=width))
    n_frames = len(pcm) // (channels * width)
    assert feats["sample_rate"] == rate
    assert feats["n_channels"] == channels
    assert feats["bits"] == width * 8
    assert feats["n_samples"] == n_frames
    assert feats["duration_ms"] == n_frames * 1000 // rate
    assert feats["first_sample"] == (pcm[0] if pcm else -1)


@given(
    payload=st.binary(min_size=0, max_size=600),
    width=st.sampled_from([4, 16, 33]),  # 33: stride padding exercised
)
@settings(max_examples=60, deadline=None)
def test_bmp_container_roundtrip_property(payload, width):
    """Any payload round-trips the BMP builder/parser: dims follow the
    row math, sum_rgb is 3× the payload byte sum (zero padding adds
    nothing), head_px is the first byte (pure-Python codec — no
    Spark)."""
    from cs_tutorial_reporting_spark.multimodal.bmp import bmp_bytes, decode_bmp

    feats = decode_bmp(bmp_bytes(payload, width=width))
    height = max(-(-len(payload) // width), 1)
    assert feats["width"] == width
    assert feats["height"] == height
    assert feats["n_pixels"] == width * height
    assert feats["sum_rgb"] == 3 * sum(payload)
    assert feats["head_px"] == (payload[0] if payload else 0)


@given(
    payload=st.binary(min_size=0, max_size=600),
    fps=st.sampled_from([5, 10, 25]),
    every_ms=st.sampled_from([100, 200, 500]),
)
@settings(max_examples=60, deadline=None)
def test_avi_container_roundtrip_property(payload, fps, every_ms):
    """Any payload round-trips the AVI builder/parser with frame math
    intact: 64 payload bytes per 8x8 frame, duration follows fps, the
    sampling grid takes every max(every_ms*fps//1000, 1)-th frame, and
    the sampled pixel sum is 3x the byte sum of exactly the sampled
    frames' payload slices (pure-Python codec - no Spark)."""
    from cs_tutorial_reporting_spark.multimodal.avi import avi_bytes, decode_avi

    feats = decode_avi(avi_bytes(payload, fps=fps), every_ms=every_ms)
    n_frames = max(-(-len(payload) // 64), 1)
    step = max(every_ms * 1000 // (1_000_000 // fps), 1)
    sampled = range(0, n_frames, step)
    assert feats["width"] == 8 and feats["height"] == 8
    assert feats["n_frames"] == n_frames
    assert feats["duration_ms"] == n_frames * (1_000_000 // fps) // 1000
    assert feats["n_sampled"] == len(sampled)
    assert feats["sum_rgb_sampled"] == 3 * sum(
        sum(payload[k * 64 : (k + 1) * 64]) for k in sampled
    )
    assert feats["head_px"] == (payload[0] if payload else 0)


# ---------------------------------------------------------------------------
# Round-6 continuation: pure-Python sketch/codec primitives (no Spark
# round-trip needed — these properties hold at the byte/integer level)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(min_size=0, max_size=2048))
def test_packbits_roundtrip_random(payload):
    """PackBits encode∘decode = identity for arbitrary byte strings."""
    from cs_tutorial_reporting_spark.multimodal.tiff import (
        packbits_decode,
        packbits_encode,
    )

    assert packbits_decode(packbits_encode(payload), len(payload)) == payload


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(min_size=0, max_size=600))
def test_tiff_full_roundtrip_random(payload):
    """Container-level round trip: synth TIFF -> decode recovers the
    payload-pure stats for arbitrary payloads."""
    from cs_tutorial_reporting_spark.multimodal.tiff import (
        decode_tiff,
        tiff_bytes,
    )

    s = decode_tiff(tiff_bytes(payload))
    assert s["sum_gray"] == sum(payload)
    assert s["n_pixels"] >= len(payload)
    assert s["head_px"] == (payload[0] if payload else 0)


@settings(max_examples=200, deadline=None)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=50
    )
)
def test_varint_width_is_monotone_and_correct(gaps):
    """The LEB128 width CASE must equal ceil(bitlen/7) clamped to
    [1, 5] for every gap in range (the SQL expression is checked by
    evaluating its Python twin)."""

    def width(g: int) -> int:
        if g < 128:
            return 1
        if g < 16384:
            return 2
        if g < 2097152:
            return 3
        if g < 268435456:
            return 4
        return 5

    for g in gaps:
        expect = max(1, min(5, -(-max(g.bit_length(), 1) // 7)))
        if g < (1 << 35):
            assert width(g) == expect, g
    assert sorted(width(g) for g in sorted(gaps)) == [
        width(g) for g in sorted(gaps)
    ]


# ---------------------------------------------------------------------------
# r11: deletion-vector lifecycle vs a pure-Python model (sources/versioned.py)
# ---------------------------------------------------------------------------

_dv_ops = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.integers(min_value=0, max_value=9)),
        st.tuples(st.just("rollback"), st.integers(min_value=0, max_value=7)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("vacuum"), st.integers(min_value=0, max_value=2)),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_dv_ops)
def test_deletion_vector_lifecycle_matches_model(spark, tmp_path_factory, ops):
    """Model-based check of the r11 DV layer: a random sequence of
    positional deletes (by grp bucket), rollbacks (to any live
    version), compactions, and chain-aware vacuums must keep EVERY
    surviving version's read equal to a pure-Python model of the
    version history — and vacuum must remove exactly the versions the
    model's reachability rule (retained ∪ pointer ∪ their _base
    chains) says are droppable."""
    from cs_tutorial_reporting_spark.sources.versioned import (
        _versions,
        apply_deletes,
        current_version,
        delete_where,
        read_version,
        vacuum,
        write_version,
    )

    path = str(tmp_path_factory.mktemp("dvmodel") / "tbl")
    rows = [(k, k % 10) for k in range(60)]
    df = spark.createDataFrame(rows, "k bigint, grp int")
    v1 = write_version(df.repartition(3, "k"), path)

    # model: per-version live id set + base pointer (None = base snapshot)
    live = {v1: {k for k, _ in rows}}
    base_of: dict[int, int | None] = {v1: None}
    cur = v1

    def model_read(v):
        return live[v]

    for op, arg in ops:
        if op == "delete":
            matching = {k for k in model_read(cur) if k % 10 == arg}
            v, n = delete_where(spark, path, f"grp = {arg}")
            assert n == len(matching)
            if not matching:
                assert v == cur  # no-op mints no version
            else:
                live[v] = model_read(cur) - matching
                base_of[v] = cur
                cur = v
        elif op == "rollback":
            from cs_tutorial_reporting_spark.sources.versioned import rollback

            targets = sorted(live)
            tgt = targets[arg % len(targets)]
            rollback(path, tgt)
            cur = tgt
        elif op == "compact":
            v = apply_deletes(spark, path)
            live[v] = set(model_read(cur))
            base_of[v] = None
            cur = v
        else:  # vacuum
            keep_last = arg
            vs = sorted(live)
            keep = set(vs[-keep_last:]) if keep_last else set()
            keep.add(cur)
            for v in list(keep):
                b = base_of.get(v)
                while b is not None and b not in keep:
                    keep.add(b)
                    b = base_of.get(b)
            expect_removed = sorted(v for v in vs if v not in keep)
            got_removed = sorted(vacuum(path, keep_last=keep_last))
            assert got_removed == expect_removed
            for v in got_removed:
                del live[v]
                del base_of[v]

        # invariants after EVERY op
        assert current_version(path) == cur
        assert sorted(_versions(path)) == sorted(live)
        got = {r.k for r in read_version(spark, path).collect()}
        assert got == model_read(cur)

    # every surviving version still time-travels to its model snapshot
    for v in sorted(live):
        got = {r.k for r in read_version(spark, path, version=v).collect()}
        assert got == model_read(v), v


@given(
    b=st.integers(min_value=1, max_value=600),
    n_q=st.integers(min_value=1, max_value=600),
    dim=st.sampled_from([1, 3, 64]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_cos_grid_bitwise_equals_unblocked_fold(b, n_q, dim, seed):
    """similarity._cos_grid (the r12 cache-blocked scorer grid) must be
    BITWISE identical to the retired unblocked per-dimension fold for
    ANY shape — including block-edge shapes (exact multiples of the
    256 tile, one-row/one-col remainders). Pure NumPy, no Spark."""
    import numpy as np

    from cs_tutorial_reporting_spark.operators.similarity import _cos_grid

    rng = np.random.default_rng(seed)
    # float32 round-trip mirrors the scorers' input path; keep norms
    # non-zero the way real callers guarantee
    mat = (
        rng.standard_normal((b, dim)).astype("float32").astype("float64")
        + 0.1
    )
    b_mat = (
        rng.standard_normal((n_q, dim)).astype("float32").astype("float64")
        + 0.1
    )

    def seq_nrm(m):
        out = np.zeros(m.shape[0])
        for d in range(dim):
            out += m[:, d] * m[:, d]
        return np.sqrt(out)

    row_nrm, b_nrm = seq_nrm(mat), seq_nrm(b_mat)
    # the retired form: full-grid accumulation, one pass per dimension
    num = np.zeros((b, n_q))
    for d in range(dim):
        num += mat[:, d : d + 1] * b_mat[None, :, d].reshape(1, -1)
    want = num / (row_nrm[:, None] * b_nrm[None, :])
    got = _cos_grid(mat, row_nrm, b_mat, b_nrm, dim)
    assert np.array_equal(got.view(np.uint64), want.view(np.uint64))
