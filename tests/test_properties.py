"""Property-based tests (hypothesis) for the pure-python cores of the
operators — the reference has no property testing at all (SURVEY §5).

These target the deterministic algorithm kernels directly (no Spark jobs
per example), so hundreds of generated cases run in seconds; the Spark
integration of the same code paths is covered by the example-based suites.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_database_api_spark.config import EngineConfig
from vector_database_api_spark.operators.multimodal import (
    decode_raw_gray,
    encode_raw_gray,
    resize_nearest,
)


# -- chunking offsets (mirrors operators/chunking.py arithmetic) ----------


def _chunk_offsets(n_chars: int, chunk_size: int, overlap: int) -> list[int]:
    stride = chunk_size - overlap
    bound = max(n_chars - overlap - 1, 0)
    return list(range(0, bound + 1, stride))


@given(
    text=st.text(min_size=0, max_size=500),
    chunk_size=st.integers(2, 200),
    overlap=st.integers(0, 199),
)
@settings(max_examples=300, deadline=None)
def test_chunk_windows_cover_and_reconstruct(text, chunk_size, overlap):
    """Every char is covered exactly once after overlap-trimming, for ANY
    (text, chunk_size, overlap) with overlap < chunk_size."""
    if overlap >= chunk_size:
        return
    offs = _chunk_offsets(len(text), chunk_size, overlap)
    chunks = [text[o : o + chunk_size] for o in offs]
    assert offs[0] == 0  # every doc yields at least one chunk
    rebuilt = (chunks[0] if chunks else "") + "".join(
        c[overlap:] for c in chunks[1:]
    )
    assert rebuilt == text
    # every chunk after the first contributes at least one new character
    # (its predecessor covers exactly up to off + overlap)
    for off in offs[1:]:
        assert off + overlap < len(text)


# -- connected components: union-find vs reachability ---------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_union_find_matches_reachability(edges):
    """Driver union-find labels == brute-force reachability min-id for
    arbitrary graphs (self-loops and duplicates included)."""
    edges = [(a, b) for a, b in edges if a != b]
    # brute force: repeated set-merge
    comps: list[set] = []
    for a, b in edges:
        hit = [c for c in comps if a in c or b in c]
        merged = {a, b}.union(*hit) if hit else {a, b}
        comps = [c for c in comps if c not in hit] + [merged]
    want = {v: min(c) for c in comps for v in c}

    from vector_database_api_spark.operators.dedup import union_find_labels

    assert union_find_labels(edges) == want


# -- RAW-GRAY codec + resize ----------------------------------------------


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_raw_gray_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert (decode_raw_gray(encode_raw_gray(arr)) == arr).all()


@given(
    h=st.integers(1, 30),
    w=st.integers(1, 30),
    oh=st.integers(1, 30),
    ow=st.integers(1, 30),
)
@settings(max_examples=200, deadline=None)
def test_resize_shape_and_value_domain(h, w, oh, ow):
    """Resize always yields the requested shape, uses only source pixels,
    and is identity when shapes match."""
    arr = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    out = resize_nearest(arr, oh, ow)
    assert out.shape == (oh, ow)
    assert set(np.unique(out)) <= set(np.unique(arr))
    if (oh, ow) == (h, w):
        assert (out == arr).all()


# -- k clamp (reference config.py:62-68 semantics) ------------------------


@given(k=st.one_of(st.none(), st.integers(-1000, 1000)))
@settings(max_examples=200, deadline=None)
def test_clamp_k_always_in_range(k):
    cfg = EngineConfig()
    out = cfg.clamp_k(k)
    assert 1 <= out <= cfg.max_k
    if k is None or k <= 0:
        assert out == cfg.default_k
    elif k <= cfg.max_k:
        assert out == k
    else:
        assert out == cfg.max_k


# -- SimHash banding losslessness (dedup.py pigeonhole claim) -------------


@given(
    bits_a=st.integers(0, 2**60 - 1),
    flip_positions=st.sets(st.integers(0, 59), min_size=0, max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_banding_pigeonhole_catches_all_close_pairs(bits_a, flip_positions):
    """For Hamming distance <= 3, 4 equal-width bands over 60 bits always
    share at least one identical band — the losslessness claim the
    simhash_near_dup oracle relies on."""
    bits_b = bits_a
    for p in flip_positions:
        bits_b ^= 1 << p
    a = f"{bits_a:060b}"
    b = f"{bits_b:060b}"
    shared = any(a[i * 15 : (i + 1) * 15] == b[i * 15 : (i + 1) * 15] for i in range(4))
    assert shared


# -- PQ kernels: encode argmin optimality + ADC exactness -----------------


@given(
    n=st.integers(1, 12),
    m=st.integers(1, 4),
    dsub=st.integers(1, 4),
    k=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_pq_encode_picks_nearest_entry(n, m, dsub, k, seed):
    """For any codebooks and rows, the chosen code minimizes the true
    subspace L2 distance over ALL codebook entries."""
    from vector_database_api_spark.operators.pq import encode_matrix

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, m * dsub))
    cb = rng.normal(size=(m, k, dsub))
    codes = encode_matrix(mat, cb)
    for i in range(n):
        for j in range(m):
            block = mat[i, j * dsub : (j + 1) * dsub]
            dists = np.linalg.norm(cb[j] - block, axis=1)
            assert np.isclose(dists[codes[i, j]], dists.min())


@given(
    n=st.integers(1, 12),
    m=st.integers(1, 4),
    dsub=st.integers(1, 4),
    k=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_pq_adc_equals_reconstructed_dot(n, m, dsub, k, seed):
    """ADC gather-sum == exact inner product of the normalized query with
    the reconstructed (codebook-concatenated) vector — quantization is
    the only approximation, the table arithmetic adds none."""
    from vector_database_api_spark.operators.pq import (
        adc_lut,
        adc_scores,
        encode_matrix,
    )

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, m * dsub))
    cb = rng.normal(size=(m, k, dsub))
    q = rng.normal(size=m * dsub)
    codes = encode_matrix(mat, cb)
    scores = adc_scores(codes, adc_lut(q, cb))
    qn = q / np.linalg.norm(q)
    for i in range(n):
        recon = np.concatenate([cb[j, codes[i, j]] for j in range(m)])
        assert np.isclose(scores[i], float(qn @ recon), atol=1e-9)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3, 4]),
    fm=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_property(h, w, ch, fm, seed):
    """encode_png/decode_png are exact inverses for every 8-bit image
    shape, channel count, and scanline-filter schedule."""
    from vector_database_api_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    b = decode_png(encode_png(a, fm))
    assert b.shape == a.shape and (b == a).all()


@given(
    sr=st.integers(min_value=1, max_value=65535),
    n=st.integers(min_value=0, max_value=512),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_raw_pcm16_roundtrip_property(sr, n, seed):
    from vector_database_api_spark.operators.multimodal import (
        decode_raw_pcm16,
        encode_raw_pcm16,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    sr2, s2 = decode_raw_pcm16(encode_raw_pcm16(sr, s))
    assert sr2 == sr and (s2 == s).all()
