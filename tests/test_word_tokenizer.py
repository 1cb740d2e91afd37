"""WordTokenizer: closed-vocab word/piece tokenization with byte fallback
(models/tokenizer.py).  The reference serves pretrained subword tokenizers
(HF AutoTokenizer); this is the native equivalent for from-scratch-trained
checkpoints — exact round-trip on ANY text, full piece coverage of the
synthetic QA world, and checkpoint persistence the pipeline auto-loads."""

import numpy as np
import pytest

from sdag_tpu.models.tokenizer import (ByteTokenizer, WordTokenizer,
                                       iter_pieces, load_tokenizer)
from sdag_tpu.utils.prompts import (SYSTEM_PROMPT_RAG, USER_RAG_PROMPT,
                                    render_docs_text)
from sdag_tpu.utils.synth_qa import (fact_doc, fact_query, make_world,
                                     malicious_doc, random_fact,
                                     styled_fact_doc, synth_word_vocab)


@pytest.fixture(scope="module")
def tok():
    return WordTokenizer(synth_word_vocab())


def test_iter_pieces_is_exact_partition():
    for text in ["the capital of kado is bodiku.",
                 "what is it?\n\n- Answer:\n", "a  b\tc", "3.14.15", ""]:
        assert "".join(iter_pieces(text)) == text


def test_round_trip_synthetic_world_no_byte_fallback(tok):
    rng = np.random.default_rng(0)
    for _ in range(100):
        f = random_fact(rng)
        for t in (fact_doc(f), fact_query(f), styled_fact_doc(f, 4),
                  malicious_doc(f, "bodiku", 2)):
            ids = tok.encode(t)
            assert tok.decode(ids) == t
            # closed-vocab coverage: no byte-fallback ids on synth text
            assert all(i >= 256 for i in ids), t


def test_round_trip_arbitrary_text_via_byte_fallback(tok):
    for t in ["France borders Spain — naïve café ☕", "tabs\tand  runs",
              "MixedCase OOV-Words 12345 !!"]:
        assert tok.decode(tok.encode(t)) == t


def test_full_prompt_round_trip_and_compression(tok):
    w = make_world(8, seed=3)
    docs = [fact_doc(f) for f in w.facts[:6]]
    prompt = tok.apply_chat_template([
        {"role": "system", "content": SYSTEM_PROMPT_RAG},
        {"role": "user", "content": USER_RAG_PROMPT.format(
            docs_text=render_docs_text(docs),
            query=fact_query(w.facts[0]))}])
    ids = tok.encode(prompt)
    assert tok.decode(ids, skip_special_tokens=False) == prompt
    byte_ids = ByteTokenizer().encode(prompt)
    # the point of the word tokenizer: ~3-4x shorter sequences
    assert len(byte_ids) / len(ids) > 2.5


def test_specials_share_byte_tokenizer_ids(tok):
    bt = ByteTokenizer()
    assert (tok.pad_token_id, tok.bos_token_id, tok.eos_token_id) == \
        (bt.pad_token_id, bt.bos_token_id, bt.eos_token_id)
    ids = tok.encode("<|eot_id|>x<|pad|>")
    assert ids[0] == tok.eos_token_id and ids[-1] == tok.pad_token_id


def test_vocab_size_lane_padded(tok):
    assert tok.vocab_size % 256 == 0
    assert tok.vocab_size >= 262 + len(synth_word_vocab())


def test_fresh_pseudoword_segments_into_syllables(tok):
    # never-seen entity -> greedy CV-syllable segmentation, not bytes
    ids = tok.encode(" zudibofa")
    assert all(i >= 256 for i in ids)
    assert len(ids) == 4  # " zu" "di" "bo" "fa"


def test_save_load_and_pipeline_autoload(tmp_path, tok):
    tok.save(str(tmp_path))
    again = load_tokenizer(str(tmp_path))
    assert isinstance(again, WordTokenizer)
    text = fact_doc(make_world(4, seed=1).facts[0])
    assert again.encode(text) == tok.encode(text)
    assert again.vocab_size == tok.vocab_size
    # a native checkpoint dir WITHOUT a word tokenizer loads as byte
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "native_decoder.json").write_text("{}")
    assert isinstance(load_tokenizer(str(tmp_path / "sub")), ByteTokenizer)


def _contains_subseq(hay, needle):
    n = len(needle)
    return any(hay[i:i + n] == needle for i in range(len(hay) - n + 1))


@pytest.mark.parametrize("tok_cls", ["word", "byte"])
def test_answer_target_is_copyable_from_doc(tok_cls, tok):
    """The train_qa answer target must be token-for-token PRESENT in the
    encoded GT doc (every surface variant): under the word tokenizer the
    bare value ("bodiku") and the mid-sentence value (" bodiku") are
    DIFFERENT ids, and targeting the bare form made the induction copy
    impossible — the r4 30M run pinned tok_acc at exactly 0.5 (EOS right,
    value never).  Pins train_qa.py's space-prefixed answer encoding."""
    t = tok if tok_cls == "word" else ByteTokenizer()
    rng = np.random.default_rng(0)
    for _ in range(20):
        f = random_fact(rng)
        ans = t.encode(" " + f.value, add_special_tokens=False)
        renders = [fact_doc(f)] + [styled_fact_doc(f, v) for v in range(5)]
        for r in renders:
            ids = t.encode(r, add_special_tokens=False)
            assert _contains_subseq(ids, ans), (f.value, r)


def test_build_example_answer_tokens_present_in_prompt(tok):
    """End-to-end pin on build_example: every weight-1.0 target token
    except EOS must literally occur among the prompt ids (the copy source
    exists in-context)."""
    from sdag_tpu.pipeline.train_qa import build_example
    rng = np.random.default_rng(1)
    for _ in range(5):
        f = random_fact(rng)
        ex = build_example(rng, tok, f, None, k=4, iso=True, seq_len=512)
        assert ex is not None
        mask = ex["loss_mask"] == 1.0
        answer_targets = ex["targets"][mask]
        prompt_ids = set(int(i) for i in
                         ex["input_ids"][:int(ex["valid_len"])].tolist())
        for a in answer_targets[:-1]:          # last = EOS, not in prompt
            assert int(a) in prompt_ids
