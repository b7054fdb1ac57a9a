"""Text synonym augmentation (host-side, train-only).

Capability parity with reference synonymizer/synonymizer.py:8-126: swap up
to 3 words of the short garbage description with synonyms, gated per batch
at --prob_aug_text (main_text.py:111-126).

The reference paraphrases with Llama-3.1-8B-Instruct (temp 0.4, top-p 0.9,
<=3 word swaps). That needs 8B of gated weights; in this zero-egress build
the default backend is a curated domain synonym table + deterministic RNG,
with the same <=3-swaps contract. A Llama-backed paraphraser can be
plugged in via ``llm_fn`` when weights are available locally (offline
tooling; never on the device path).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

# compact domain table for the Calgary garbage-text vocabulary
SYNONYMS = {
    "bottle": ["flask", "container", "vial"],
    "can": ["tin", "canister"],
    "cup": ["mug", "beaker"],
    "box": ["carton", "crate", "case"],
    "bag": ["sack", "pouch"],
    "paper": ["sheet", "page"],
    "newspaper": ["paper", "gazette"],
    "plastic": ["polymer"],
    "glass": ["crystal"],
    "metal": ["steel", "alloy"],
    "food": ["meal", "leftovers"],
    "peel": ["skin", "rind"],
    "battery": ["cell", "powercell"],
    "phone": ["handset", "mobile"],
    "old": ["used", "worn"],
    "broken": ["damaged", "cracked"],
    "empty": ["hollow", "drained"],
    "small": ["little", "tiny"],
    "large": ["big", "huge"],
    "water": ["drinking"],
    "coffee": ["espresso"],
    "waste": ["trash", "refuse"],
    "container": ["receptacle", "holder"],
    "wrapper": ["wrapping", "foil"],
    "jar": ["pot", "vessel"],
    "lid": ["cap", "cover"],
    "toy": ["plaything"],
    "clothes": ["garments", "apparel"],
    "shoe": ["sneaker", "boot"],
}

MAX_SWAPS = 3  # reference contract: swap <= 3 words


class Synonymizer:
    def __init__(self, seed: int = 0,
                 llm_fn: Optional[Callable[[str], str]] = None):
        self.rng = np.random.default_rng(seed)
        self.llm_fn = llm_fn

    def augment(self, text: str) -> str:
        if self.llm_fn is not None:
            return self.llm_fn(text)
        words = text.split()
        swappable = [i for i, w in enumerate(words) if w.lower() in SYNONYMS]
        if not swappable:
            return text
        self.rng.shuffle(swappable)
        for i in swappable[:MAX_SWAPS]:
            options = SYNONYMS[words[i].lower()]
            words[i] = options[int(self.rng.integers(len(options)))]
        return " ".join(words)


def make_hf_llm_fn(model_path: str = None, *, model=None, tokenizer=None,
                   max_changes: int = MAX_SWAPS, temperature: float = 0.4,
                   top_p: float = 0.9, max_new_tokens: int = 6,
                   batch_size: int = 8):
    """The reference LLM paraphraser backend, template-exact
    (synonymizer/synonymizer.py:42-126): Llama-3.1-8B-Instruct chat
    template, temp 0.4 / top-p 0.9, 6 new tokens, <=3 word swaps,
    decode-strip on the rendered user prompt.

    Pass ``model_path`` to local weights (production; this image is
    zero-egress so nothing downloads) or inject ``model``/``tokenizer``
    directly (tests exercise the full path with a tiny random Llama).
    The returned fn accepts one sentence or a list and plugs into
    ``Synonymizer(llm_fn=...)``."""
    import torch

    if model is None or tokenizer is None:
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path,
                                                  padding_side="left")
        model = AutoModelForCausalLM.from_pretrained(model_path)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    model.eval()

    # reference synonymizer.py:59-64, verbatim
    sys_prompt = (
        "You are a careful paraphraser. Your task is to replace a FEW words "
        "with close synonyms while preserving exact meaning, tone, and "
        "grammar. "
        "Do NOT alter numbers, units, dates, or named entities. "
        f"Change at most {max_changes} words. Output ONLY the final "
        "sentence."
    )

    def llm_fn(sentences):
        single = isinstance(sentences, str)
        if single:
            sentences = [sentences]
        cleaned = [s.strip().strip('"').strip("'") for s in sentences]
        outputs = []
        for start in range(0, len(cleaned), batch_size):
            chunk = cleaned[start:start + batch_size]
            # reference :74-78, verbatim
            user_prompts = [
                f"Rewrite by swapping a few words with close synonyms "
                f"(at most {max_changes}).\n"
                f"Sentence: {text}"
                for text in chunk
            ]
            chats = [tokenizer.apply_chat_template(
                [{"role": "system", "content": sys_prompt},
                 {"role": "user", "content": up}],
                tokenize=False, add_generation_prompt=True)
                for up in user_prompts]
            inputs = tokenizer(chats, return_tensors="pt",
                               add_special_tokens=False, padding=True)
            with torch.no_grad():
                gen = model.generate(
                    **inputs, max_new_tokens=max_new_tokens, do_sample=True,
                    temperature=temperature, top_p=top_p,
                    eos_token_id=tokenizer.eos_token_id,
                    pad_token_id=tokenizer.eos_token_id)
            decoded = tokenizer.batch_decode(gen, skip_special_tokens=True)
            for text_out, up in zip(decoded, user_prompts):
                out = text_out.split(up)[-1].strip()
                for tag in ["Assistant:", "assistant:", "Response:",
                            "Output:", "assistant"]:
                    if out.startswith(tag):
                        out = out[len(tag):].strip()
                outputs.append(" ".join(out.split()))
        return outputs[0] if single else outputs

    return llm_fn
