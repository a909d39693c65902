"""Property-based codec checks (hypothesis): the JPEG encoder/decoder pair
and the AVI container must hold their contracts on ARBITRARY inputs, not
just the synthesized oracle tier — shapes, error bounds, and container
losslessness are invariants, so they are stated as properties."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kin_data_pipeline_spark.operators import multimodal as mm

_dims = st.integers(min_value=1, max_value=48)


@settings(max_examples=25, deadline=None)
@given(
    h=_dims,
    w=_dims,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_any_raster_bounded_error(h, w, seed):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, 256, (h, w)).astype("uint8")
    blob = mm.encode_baseline_jpeg(r)
    mime, pw, ph, nc = mm.parse_media_header(blob)
    assert (mime, pw, ph, nc) == ("image/jpeg", w, h, 1)
    dec = mm.decode_baseline_jpeg(blob)
    assert dec.shape == r.shape and dec.dtype == np.dtype("uint8")
    err = np.abs(dec.astype(int) - r.astype(int))
    # uniform quantization (AC step 8, DC step 8) bounds the block error;
    # 96 is a loose deterministic ceiling — the EXACT contract lives in
    # the block-constant property below
    assert int(err.max()) <= 96
    assert float(err.mean()) <= 16.0


@settings(max_examples=25, deadline=None)
@given(
    bh=st.integers(min_value=1, max_value=6),
    bw=st.integers(min_value=1, max_value=6),
    crop_y=st.integers(min_value=0, max_value=7),
    crop_x=st.integers(min_value=0, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_block_constant_is_exact(bh, bw, crop_y, crop_x, seed):
    """Any raster that is constant within every 8x8 tile (arbitrary values,
    arbitrary non-multiple-of-8 crop) must round-trip EXACTLY: constant
    blocks quantize to a lone DC coefficient with step 8, which the
    level-shifted decode recovers bit-for-bit."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, (bh, bw)).astype("uint8")
    full = np.kron(vals, np.ones((8, 8), dtype="uint8"))
    h = bh * 8 - crop_y
    w = bw * 8 - crop_x
    if h == 0 or w == 0:
        return
    r = full[:h, :w]
    dec = mm.decode_baseline_jpeg(mm.encode_baseline_jpeg(r))
    assert np.array_equal(dec, r)


@settings(max_examples=50, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=0, max_size=300), min_size=0, max_size=12
    ),
    w=_dims,
    h=_dims,
)
def test_avi_container_is_lossless_around_payloads(frames, w, h):
    """The container is pure framing: parse(encode(frames)) returns the
    byte-identical payload list (odd-length chunks exercise RIFF even-
    offset padding), and the declared geometry survives."""
    avi = mm.encode_avi_mjpeg(frames, w, h)
    nf, pw, ph, got = mm.parse_avi_mjpeg(avi)
    assert (nf, pw, ph) == (len(frames), w, h)
    assert [bytes(g) for g in got] == [bytes(f) for f in frames]
    assert mm.parse_media_header(avi) == ("video/x-msvideo", w, h, 1)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    h1=st.sampled_from([1, 2]),
    v1=st.sampled_from([1, 2]),
    dc_al=st.integers(0, 2),
    ac_al=st.integers(0, 2),
    split=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_progressive_subsampled_matches_baseline_subsampled(
    h, w, h1, v1, dc_al, ac_al, split, seed
):
    """The composed profile (SOF2 progressive × chroma subsampling) must
    decode bit-identically to the baseline-subsampled encoding of the
    same planes: both quantize the same forward blocks, and a complete
    progressive scan script reconstructs the exact coefficients — any
    divergence is a scan-script bug (interleaved-DC MCU walk, true-vs-
    padded AC rasters, refinement bit planes)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ch, cw = -(-h // v1), -(-w // h1)
    cb = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    cr = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    bands = ((1, 5), (6, 63)) if split else ((1, 63),)
    base = mm.decode_baseline_jpeg(mm.encode_ycbcr_subsampled_jpeg(y, cb, cr, h1, v1))
    prog = mm.decode_baseline_jpeg(
        mm.encode_progressive_ycbcr_jpeg(y, cb, cr, h1, v1, 8, bands, dc_al, ac_al)
    )
    assert base.shape == prog.shape == (h, w, 3)
    assert np.array_equal(base, prog)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    f0=st.tuples(st.integers(1, 4), st.integers(1, 4)),
    f1=st.tuples(st.integers(1, 4), st.integers(1, 4)),
    progressive=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_arbitrary_layout_roundtrip(h, w, f0, f1, progressive, seed):
    """ANY 1..4 factor layout (dividing or not): baseline and progressive
    encodings of the same planes decode identically, at the declared full
    resolution, with a third 1x1 component riding along."""
    rng = np.random.default_rng(seed)
    factors = [f0, f1, (1, 1)]
    hmax = max(x for x, _ in factors)
    vmax = max(y for _, y in factors)
    planes = [
        rng.integers(
            0, 256, (-(-h * v // vmax), -(-w * x // hmax)), dtype=np.uint8
        )
        for x, v in factors
    ]
    base = mm.decode_baseline_jpeg(mm.encode_layout_jpeg(w, h, planes, factors))
    assert base.shape == (h, w, 3)
    multi = mm.decode_baseline_jpeg(
        mm.encode_layout_jpeg(w, h, planes, factors, scan_mode="per_component")
    )
    assert np.array_equal(base, multi)
    if progressive:
        prog = mm.decode_baseline_jpeg(
            mm.encode_progressive_layout_jpeg(
                w, h, planes, factors, 8, ((1, 63),), 1, 1
            )
        )
        assert np.array_equal(base, prog)
