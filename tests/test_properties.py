"""Property-based tests (hypothesis) for the pure-Python kernels — the
test class the reference entirely lacks (SURVEY.md §5). Spark stays out
of the hypothesis loop (per-example JVM jobs would be pathological);
these cover the driver-side kernels whose Spark twins are separately
oracle-tested.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mlx_vector_db_spark.functions.text import chunk_text
from mlx_vector_db_spark.operators.ann import lsh_probe_buckets, make_planes
from mlx_vector_db_spark.pipeline import HashingEncoder, masked_mean_pool

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po")),
    max_size=2000,
)
sizes = st.integers(min_value=10, max_value=400)


@settings(max_examples=200, deadline=None)
@given(text=texts, size=sizes, overlap_frac=st.floats(0, 0.9))
def test_chunker_invariants(text, size, overlap_frac):
    overlap = int(size * overlap_frac)
    chunks = chunk_text(text, size, overlap)
    # 1) at least one chunk for any text; short text passes through
    assert chunks
    if len(text) <= size:
        assert chunks == [text]
    # 2) no chunk exceeds the window
    assert all(len(c) <= size for c in chunks)
    # 3) every chunk is a (stripped) substring of the source
    assert all(c in text for c in chunks if c)
    # 4) coverage: concatenated chunk content contains every
    #    non-whitespace character count-wise at least once (strides
    #    overlap, never skip content beyond stripping)
    if size > overlap + 1:
        src = "".join(text.split())
        joined = "".join("".join(c.split()) for c in chunks)
        assert len(joined) >= len(src) - 0  # overlapping windows cover all


@settings(max_examples=100, deadline=None)
@given(
    tokens=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), max_size=30)
)
def test_hashing_encoder_invariants(tokens):
    enc = HashingEncoder(32)
    text = " ".join(tokens)
    v = enc([text, text, text + " extra"])
    # determinism
    assert np.array_equal(v[0], v[1])
    # unit norm or exactly zero (no tokens)
    n = np.linalg.norm(v[0])
    assert abs(n - 1.0) < 1e-5 or n == 0.0
    # cosine bounded
    assert -1.0001 <= float(v[0] @ v[2]) <= 1.0001


@settings(max_examples=100, deadline=None)
@given(
    batch=st.integers(1, 4),
    seq=st.integers(1, 6),
    dim=st.integers(1, 8),
    data=st.data(),
)
def test_masked_mean_pool_invariants(batch, seq, dim, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    hidden = rng.standard_normal((batch, seq, dim)).astype(np.float32)
    mask = rng.integers(0, 2, (batch, seq))
    out = masked_mean_pool(hidden, mask)
    assert out.shape == (batch, dim)
    assert np.isfinite(out).all()  # eps floor: no NaN even fully masked
    for b in range(batch):
        sel = mask[b].astype(bool)
        if sel.any():
            assert np.allclose(out[b], hidden[b, sel].mean(axis=0), atol=1e-5)
        else:
            assert np.abs(out[b]).max() < 1e-3


@settings(max_examples=100, deadline=None)
@given(dim=st.integers(2, 32), multiprobe=st.integers(0, 8), seed=st.integers(0, 100))
def test_lsh_probe_invariants(dim, multiprobe, seed):
    planes = make_planes(dim, n_planes=8, seed=seed)
    rng = np.random.default_rng(seed)
    q = rng.standard_normal(dim)
    probes = lsh_probe_buckets(q.tolist(), planes, multiprobe=multiprobe)
    # own bucket first, correct count, all distinct, single-bit flips
    assert len(probes) == 1 + min(multiprobe, 8)
    assert len(set(probes)) == len(probes)
    base = probes[0]
    for p in probes[1:]:
        x = base ^ p
        assert x != 0 and (x & (x - 1)) == 0  # exactly one bit differs
