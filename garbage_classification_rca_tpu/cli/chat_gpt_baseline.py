"""LLM-from-filenames baseline (reference chat_GPT_results.py:31-129).

Asks a chat LLM to classify 10 filenames per request into the 4 Calgary
bins, writing per-chunk JSON result files. Backend is pluggable:
``--backend=openai`` uses the OpenAI API when a key + egress exist
(reference behavior); ``--backend=rules`` is an offline keyword heuristic
so the evaluation plumbing runs hermetically.
"""

from __future__ import annotations

import argparse
import json
import os

from ..data.manifest import build_manifest, pre_process_text

SYSTEM_PROMPT = (
    "You are a waste-sorting assistant for Calgary. Classify each item "
    "into exactly one bin: Blue (recyclable), Green (compostable), Black "
    "(non-recyclable garbage), or TTR (take to a recycling location). "
    "Answer with one bin name per item.")

CHUNK = 10  # reference chat_GPT_results.py chunks 10 filenames per call

_RULES = {
    "blue": ["bottle", "can", "paper", "newspaper", "cardboard", "jar",
             "tin", "container", "carton"],
    "green": ["banana", "apple", "food", "peel", "core", "yard", "leaf",
              "compost", "coffee"],
    "ttr": ["battery", "phone", "paint", "electronics", "chemical",
            "lightbulb", "propane"],
}


def classify_rules(text: str) -> str:
    t = text.lower()
    for cls, words in _RULES.items():
        if any(w in t for w in words):
            return cls
    return "black"


def classify_openai_chunk(client, model, texts):
    prompt = "\n".join(f"{i + 1}. {t}" for i, t in enumerate(texts))
    resp = client.chat.completions.create(
        model=model, messages=[{"role": "system", "content": SYSTEM_PROMPT},
                               {"role": "user", "content": prompt}])
    lines = resp.choices[0].message.content.strip().splitlines()
    out = []
    for line in lines[:len(texts)]:
        low = line.lower()
        for cls in ("blue", "green", "black", "ttr"):
            if cls in low:
                out.append(cls)
                break
        else:
            out.append("black")
    out += ["black"] * (len(texts) - len(out))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_folder_name", required=True)
    p.add_argument("--output_dir", default="chat_gpt_results")
    p.add_argument("--backend", default="rules", choices=["rules", "openai"])
    p.add_argument("--openai_model", default="gpt-4")
    a = p.parse_args(argv)

    m = build_manifest(a.dataset_folder_name)
    os.makedirs(a.output_dir, exist_ok=True)
    client = None
    if a.backend == "openai":
        from openai import OpenAI  # needs egress + OPENAI_API_KEY
        client = OpenAI()

    correct = total = 0
    for cls_idx, cls in enumerate(m.classes):
        samples = m.per_class[cls_idx]
        for ci in range(0, len(samples), CHUNK):
            chunk = samples[ci:ci + CHUNK]
            texts = [pre_process_text(os.path.splitext(
                os.path.basename(s.image_path))[0]) for s in chunk]
            if a.backend == "openai":
                preds = classify_openai_chunk(client, a.openai_model, texts)
            else:
                preds = [classify_rules(t) for t in texts]
            results = [{"filename": os.path.basename(s.image_path),
                        "text": t, "true": cls, "pred": pr}
                       for s, t, pr in zip(chunk, texts, preds)]
            out = os.path.join(a.output_dir,
                               f"results_{cls}_chunk_{ci // CHUNK}.json")
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
            correct += sum(r["pred"] == r["true"] for r in results)
            total += len(results)
    print(f"accuracy: {100.0 * correct / total:.2f} % ({correct}/{total})")


if __name__ == "__main__":
    main()
