"""E5 encoder tests: normalization, prefixing, mask invariance, determinism."""

import jax
import numpy as np
import pytest

from sdag_tpu.models.e5 import (E5Encoder, EncoderConfig, encoder_forward,
                                init_encoder_params)
from sdag_tpu.models.tokenizer import ByteTokenizer

CFG = EncoderConfig.tiny()


@pytest.fixture(scope="module")
def enc():
    params = init_encoder_params(jax.random.PRNGKey(0), CFG)
    return E5Encoder(params, CFG, ByteTokenizer(), model_name="tiny-e5")


def test_encode_normalized(enc):
    emb = enc.encode(["hello world", "another text"], kind="passage")
    assert emb.shape == (2, CFG.d_model)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_e5_prefix_changes_embedding(enc):
    q = enc.encode(["same text"], kind="query")
    p = enc.encode(["same text"], kind="passage")
    r = enc.encode(["same text"], kind="raw")
    assert np.abs(q - p).max() > 1e-6
    assert np.abs(p - r).max() > 1e-6


def test_padding_invariance(enc):
    """Embedding must not depend on how much padding the batch forces."""
    a = enc.encode(["short"], kind="passage")
    b = enc.encode(["short", "x" * 300], kind="passage")[0:1]
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_batch_split_invariance(enc):
    texts = [f"text number {i}" for i in range(7)]
    full = enc.encode(texts, kind="passage", batch_size=7)
    split = enc.encode(texts, kind="passage", batch_size=3)
    np.testing.assert_allclose(full, split, atol=1e-4)


def test_empty_input(enc):
    emb = enc.encode([], kind="query")
    assert emb.shape == (0, CFG.d_model)


def test_similarity_sanity(enc):
    """Identical texts are more similar than different ones."""
    e = enc.encode(["the cat sat", "the cat sat", "quantum flux capacitor"],
                   kind="passage")
    same = float(e[0] @ e[1])
    diff = float(e[0] @ e[2])
    assert same > diff


def test_tokenizer_specials_roundtrip():
    from sdag_tpu.models.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    text = "<|begin_of_text|>hello <|eot_id|> world"
    ids = tok.encode(text)
    # specials map to single ids
    assert tok.bos_token_id in ids and tok.eos_token_id in ids
    assert tok.decode(ids, skip_special_tokens=False) == text
    assert tok.decode(ids, skip_special_tokens=True) == "hello  world"
    # chat template renders headers + generation prompt
    chat = tok.apply_chat_template(
        [{"role": "user", "content": "hi"}], add_generation_prompt=True)
    assert chat.startswith("<|begin_of_text|>")
    assert chat.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    # unicode round-trips through byte encoding
    s = "café ☕ 日本"
    assert tok.decode(tok.encode(s)) == s


def test_encoder_truncation(enc):
    """Texts beyond max_length are truncated, not errored."""
    long_text = "word " * 2000
    emb = enc.encode([long_text], kind="passage")
    assert emb.shape == (1, CFG.d_model)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_data_parallel_encode_matches_single_device(enc):
    """Index-build encoding sharded over the 'data' mesh axis must be
    output-identical to the single-device forward (pure batch
    parallelism), including when the batch is not divisible by the axis
    size (zero-mask pad rows are dropped)."""
    from sdag_tpu.core.mesh import make_mesh
    mesh = make_mesh(data=jax.device_count(), model=1)
    dp = E5Encoder(enc.params, CFG, ByteTokenizer(), model_name="tiny-e5",
                   dp_mesh=mesh)
    texts = [f"passage number {i} about topic {i % 3}" for i in range(11)]
    ref = enc.encode(texts, kind="passage", batch_size=16)
    got = dp.encode(texts, kind="passage", batch_size=16)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_data_parallel_encode_fused_matches_single_device(enc):
    """The DP path must run the SAME forward as single-device — including
    the fused Pallas attention kernel (on CPU via interpret mode).  Guards
    against the DP wrapper silently dropping fused_attention, which would
    skew build-side vs query-side embeddings on TPU."""
    from sdag_tpu.core.mesh import make_mesh
    from sdag_tpu.ops import encoder_attention as ea
    mesh = make_mesh(data=jax.device_count(), model=1)
    orig = ea.encoder_attention_fused_qkv
    try:
        ea.encoder_attention_fused_qkv = \
            lambda qkv, vl, n_heads: orig(qkv, vl, n_heads=n_heads,
                                          interpret=True)
        single = E5Encoder(enc.params, CFG, ByteTokenizer(),
                           model_name="tiny-e5", fused=True)
        dp = E5Encoder(enc.params, CFG, ByteTokenizer(),
                       model_name="tiny-e5", dp_mesh=mesh, fused=True)
        texts = [f"passage number {i} about topic {i % 3}"
                 for i in range(11)]
        ref = single.encode(texts, kind="passage", batch_size=16)
        got = dp.encode(texts, kind="passage", batch_size=16)
    finally:
        ea.encoder_attention_fused_qkv = orig
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_fused_qkv_params_match_plain(enc):
    """fuse_qkv_params (one [d,3d] matmul instead of three) must be
    numerically identical to the plain wq/wk/wv forward."""
    from sdag_tpu.models.e5 import fuse_qkv_params
    rng = np.random.default_rng(3)
    ids = rng.integers(1, CFG.vocab_size, size=(4, 64)).astype(np.int32)
    mask = np.ones((4, 64), np.int32)
    mask[1, 40:] = 0
    mask[3, 10:] = 0
    ref = encoder_forward(enc.params, CFG, ids, mask)
    got = encoder_forward(fuse_qkv_params(enc.params), CFG, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_attention_kernel_matches_reference():
    """Pallas fused encoder attention (interpret mode off-TPU) == XLA
    reference with the [B,H,L,L] materialized, incl. prefix masking."""
    from sdag_tpu.ops.encoder_attention import (encoder_attention_fused,
                                                encoder_attention_reference)
    rng = np.random.default_rng(0)
    B, H, L, Dh = 3, 4, 128, 32
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    vl = np.array([128, 77, 1], np.int32)
    ref = encoder_attention_reference(jax.numpy.asarray(q),
                                      jax.numpy.asarray(k),
                                      jax.numpy.asarray(v),
                                      jax.numpy.asarray(vl))
    # kernel v2 contract: [B, L, H, Dh] in, [B, L, H*Dh] out
    got = encoder_attention_fused(jax.numpy.asarray(q.transpose(0, 2, 1, 3)),
                                  jax.numpy.asarray(k.transpose(0, 2, 1, 3)),
                                  jax.numpy.asarray(v.transpose(0, 2, 1, 3)),
                                  jax.numpy.asarray(vl), interpret=True)
    got = np.asarray(got).reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
    # compare only rows < valid_len (padded rows are pooled away)
    for b in range(B):
        np.testing.assert_allclose(got[b, :, :vl[b]],
                                   np.asarray(ref)[b, :, :vl[b]],
                                   rtol=2e-5, atol=2e-5)


def test_encoder_fused_attention_end_to_end_matches():
    """Full encoder with fused QKV + fused attention kernel (interpret)
    == plain encoder, through the E5Encoder mask/pooling contract."""
    from sdag_tpu.models.e5 import fuse_qkv_params
    from sdag_tpu.ops import encoder_attention as ea
    params = init_encoder_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(5)
    ids = rng.integers(1, CFG.vocab_size, size=(5, 64)).astype(np.int32)
    mask = np.zeros((5, 64), np.int32)
    for i, n in enumerate([64, 3, 17, 50, 1]):
        mask[i, :n] = 1
    ref = encoder_forward(params, CFG, ids, mask)
    orig = ea.encoder_attention_fused_qkv
    try:
        ea.encoder_attention_fused_qkv = \
            lambda qkv, vl, n_heads: orig(qkv, vl, n_heads=n_heads,
                                          interpret=True)
        got = encoder_forward(fuse_qkv_params(params), CFG, ids, mask,
                              fused_attention=True)
    finally:
        ea.encoder_attention_fused_qkv = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_qkv_direct_kernel_matches_reference():
    """Packed-qkv kernel entry (no split copies) == XLA reference: the
    per-head index maps must pick q_h / k_h / v_h at 3H-axis indices
    h / H+h / 2H+h of the projection layout."""
    from sdag_tpu.ops.encoder_attention import (
        encoder_attention_fused_qkv, encoder_attention_reference)
    rng = np.random.default_rng(7)
    B, H, L, Dh = 2, 4, 128, 32
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    vl = np.array([128, 53], np.int32)
    ref = encoder_attention_reference(*map(jax.numpy.asarray, (q, k, v)),
                                      jax.numpy.asarray(vl))
    # pack in projection layout: [B, L, 3d], columns [q heads | k | v]
    packed = np.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(B, L, H * Dh) for t in (q, k, v)],
        axis=2)
    got = encoder_attention_fused_qkv(jax.numpy.asarray(packed),
                                      jax.numpy.asarray(vl), n_heads=H,
                                      interpret=True)
    got = np.asarray(got).reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
    for b in range(B):
        np.testing.assert_allclose(got[b, :, :vl[b]],
                                   np.asarray(ref)[b, :, :vl[b]],
                                   rtol=2e-5, atol=2e-5)


def test_gelu_tanh_close_to_erf():
    """The TPU-production tanh gelu must stay within a pinned cosine of
    the exact-erf embeddings (the documented fast-path quality bound)."""
    params = init_encoder_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(11)
    ids = rng.integers(1, CFG.vocab_size, size=(6, 64)).astype(np.int32)
    mask = np.ones((6, 64), np.int32)
    mask[2, 40:] = 0
    a = np.asarray(encoder_forward(params, CFG, ids, mask, gelu="erf"))
    b = np.asarray(encoder_forward(params, CFG, ids, mask, gelu="tanh"))
    cos = np.sum(a * b, axis=1)  # embeddings are L2-normalized
    assert cos.min() >= 0.9999, cos
