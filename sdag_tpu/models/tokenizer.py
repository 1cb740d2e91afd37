"""Tokenization.

``load_tokenizer`` prefers a local HuggingFace tokenizer (this environment
has no network egress, so only local checkpoint dirs work); otherwise it
falls back to a deterministic byte-level tokenizer with a Llama-3-style chat
template, which is what the tests and the random-weight model scale use.

Unlike the reference — which recovers document token spans by substring
search plus re-tokenizing every prefix (``SDAG.py:277-302``) — prompts here
are built from independently tokenized segments (sdag/spans.py), so any
tokenizer that is prefix-stable per segment works.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Sequence

_SPECIALS = [
    "<|pad|>",
    "<|begin_of_text|>",
    "<|end_of_text|>",
    "<|start_header_id|>",
    "<|end_header_id|>",
    "<|eot_id|>",
]


class ByteTokenizer:
    """Byte-level tokenizer: ids 0-255 are raw bytes; specials follow.

    vocab_size is padded to a lane-friendly 512.
    """

    def __init__(self) -> None:
        self._special_to_id: Dict[str, int] = {
            s: 256 + i for i, s in enumerate(_SPECIALS)}
        self._id_to_special = {v: k for k, v in self._special_to_id.items()}
        self.vocab_size = 512
        self.pad_token_id = self._special_to_id["<|pad|>"]
        self.bos_token_id = self._special_to_id["<|begin_of_text|>"]
        self.eos_token_id = self._special_to_id["<|eot_id|>"]
        self._special_re = re.compile(
            "(" + "|".join(re.escape(s) for s in _SPECIALS) + ")")

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids: List[int] = []
        if add_special_tokens:
            ids.append(self.bos_token_id)
        for part in self._special_re.split(text):
            if not part:
                continue
            if part in self._special_to_id:
                ids.append(self._special_to_id[part])
            else:
                ids.extend(part.encode("utf-8"))
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True
               ) -> str:
        out: List[str] = []
        buf = bytearray()
        for i in ids:
            i = int(i)
            if i in self._id_to_special:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                if not skip_special_tokens:
                    out.append(self._id_to_special[i])
            elif 0 <= i < 256:
                buf.append(i)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)

    def apply_chat_template(self, messages: List[Dict[str, str]],
                            tokenize: bool = False,
                            add_generation_prompt: bool = True) -> str:
        parts = ["<|begin_of_text|>"]
        for m in messages:
            parts.append(
                f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                f"{m['content']}<|eot_id|>")
        if add_generation_prompt:
            parts.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        text = "".join(parts)
        if tokenize:
            return self.encode(text)
        return text


def load_tokenizer(name_or_path: str = ""):
    """Local HF tokenizer if a checkpoint dir exists; byte fallback else."""
    if name_or_path and os.path.isdir(name_or_path):
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(name_or_path)
            if tok.pad_token is None:
                tok.pad_token = tok.eos_token
            return tok
        except Exception as e:  # noqa: BLE001
            print(f"[tokenizer] HF load failed ({e}); using byte fallback")
    return ByteTokenizer()
