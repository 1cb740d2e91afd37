"""Numerical parity of our JAX models vs HF torch models with converted
weights (tiny configs instantiated locally — no network)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sdag_tpu.models.hf_convert import (convert_bert_state_dict,
                                        convert_llama_state_dict,
                                        decoder_config_from_hf,
                                        encoder_config_from_hf)
from sdag_tpu.models.llama import prefill  # noqa: E402
from sdag_tpu.models.e5 import encoder_forward  # noqa: E402


def test_llama_forward_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()

    cfg = decoder_config_from_hf(hf_cfg)
    params = convert_llama_state_dict(model.state_dict(), cfg)

    ids = np.array([[3, 17, 99, 255, 42, 7, 8, 9]], np.int64)
    with torch.no_grad():
        hf_logits = model(input_ids=torch.tensor(ids)).logits.numpy()
    our_logits, _ = prefill(params, cfg, jnp.asarray(ids, jnp.int32),
                            with_cache=False, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(our_logits), hf_logits,
                               atol=2e-3, rtol=1e-3)


def test_bert_encoder_parity():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()

    cfg = encoder_config_from_hf(hf_cfg)
    params = convert_bert_state_dict(model.state_dict(), cfg)

    ids = np.array([[5, 9, 33, 100, 2, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)
                       ).last_hidden_state.numpy()
    # our encoder mean-pools + normalizes; compare against HF's pooled states
    our_emb = np.asarray(encoder_forward(params, cfg, jnp.asarray(ids,
                                                                  jnp.int32),
                                         jnp.asarray(mask, jnp.int32)))
    m = mask[..., None].astype(np.float32)
    ref = (hf_out * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(our_emb, ref, atol=2e-4, rtol=1e-3)


def test_llama31_rope_scaling_parity():
    """HF 'llama3' rope scaling (Llama-3.1) must match numerically."""
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=500000.0,
        tie_word_embeddings=False, attn_implementation="eager",
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64})
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 64)
    params = convert_llama_state_dict(model.state_dict(), cfg)
    ids = np.arange(1, 97, dtype=np.int64).reshape(1, 96) % 250
    with torch.no_grad():
        hf_logits = model(input_ids=torch.tensor(ids)).logits.numpy()
    our_logits, _ = prefill(params, cfg, jnp.asarray(ids, jnp.int32),
                            with_cache=False, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(our_logits), hf_logits,
                               atol=2e-3, rtol=1e-3)


def test_e5_encode_string_to_embedding_parity(tmp_path):
    """Full string->embedding parity vs the SentenceTransformer-equivalent
    pipeline: HF BertTokenizer ([CLS]/[SEP], truncation) + BertModel +
    masked mean pool + L2 norm (reference dense.py:44-65).

    Guards the _tokenize special-token rule: with add_special_tokens=False
    (round-1 bug) the embeddings silently diverge.
    """
    from transformers import BertConfig, BertModel, BertTokenizer
    from sdag_tpu.models.e5 import E5Encoder

    words = ["the", "cat", "sat", "on", "mat", "dog", "passage", "query",
             ":", "a", "ran", "##s", "hello", "world"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words)
        + "\n", encoding="utf-8")
    tok = BertTokenizer(str(vocab_file), do_lower_case=True)

    hf_cfg = BertConfig(
        vocab_size=tok.vocab_size, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(3)
    model = BertModel(hf_cfg).eval()
    cfg = encoder_config_from_hf(hf_cfg)
    params = convert_bert_state_dict(model.state_dict(), cfg)

    max_len = 10  # force truncation on the long text below
    enc = E5Encoder(params, cfg, tok, model_name="e5-large-v2",
                    max_length=max_len, pad_multiple=4)
    texts = ["the cat sat on a mat",
             "hello world",
             "the dog ran " * 8]  # > max_len tokens

    # SentenceTransformer-equivalent reference path (strings in).
    prefixed = [f"passage: {t}" for t in texts]
    batch = tok(prefixed, padding=True, truncation=True, max_length=max_len,
                return_tensors="pt")
    with torch.no_grad():
        hidden = model(input_ids=batch["input_ids"],
                       attention_mask=batch["attention_mask"]
                       ).last_hidden_state.numpy()
    m = batch["attention_mask"].numpy()[..., None].astype(np.float32)
    ref = (hidden * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    ours = enc.encode(texts, kind="passage")
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
