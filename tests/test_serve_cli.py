"""cli.serve — the JSONL continuous-batching server front-end.

Exactness contract inherited from serving/engine.py (tests/test_serving.py):
every request's token stream must equal the standalone library decode on
the same prompt. Here we pin the CLI layer on top: prompt assembly
(text-only vs BLIP-2 image prompts at the CLI's fixed shapes), per-request
budgets, streamed JSONL output, and graceful bad-request handling — on the
tiny hermetic geometry (GC_RCA_TINY_BLIP2=1, deterministic random init).
"""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

BPE_VOCAB = os.path.join(os.path.dirname(__file__), "fixtures", "vocab",
                         "bpe")

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _tiny(monkeypatch):
    monkeypatch.setenv("GC_RCA_TINY_BLIP2", "1")


def _serve(reqs, argv):
    from garbage_classification_rca_tpu.cli import serve

    stdin = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    rc = serve.main(argv + [f"--vocab_dir={BPE_VOCAB}"],
                    stdin=stdin, stdout=out)
    assert rc == 0
    return [json.loads(l) for l in out.getvalue().splitlines()]


def _oracle_setup(max_prompt):
    """Rebuild exactly what the CLI builds (same seed/dtype/vocab)."""
    from garbage_classification_rca_tpu.cli.blip2_common import build_blip2
    from garbage_classification_rca_tpu.config import args_parser

    args = args_parser([f"--vocab_dir={BPE_VOCAB}",
                        f"--max_prompt={max_prompt}"])
    return build_blip2(args)


def test_text_requests_match_standalone_generate():
    """Greedy text-only streams == opt.generate on the same left-padded
    prompt with the same (seeded) params + LoRA."""
    from garbage_classification_rca_tpu.cli.blip2_common import left_pad
    from garbage_classification_rca_tpu.models.vlm import opt

    max_prompt, max_new = 16, 5
    reqs = [{"id": "r0", "text": "Question: which bin? Answer:"},
            {"id": "r1", "text": "hello world", "max_new": 3}]
    out = _serve(reqs, [f"--max_prompt={max_prompt}",
                        f"--max_new_tokens={max_new}",
                        "--serve_slots=2"])
    got = {d["id"]: d for d in out}
    assert set(got) == {"r0", "r1"}
    assert got["r1"]["n_tokens"] <= 3          # per-request budget

    cfg, params, lora, tok = _oracle_setup(max_prompt)
    emb_dtype = params["opt"]["embed_tokens"]["w"].dtype
    for r in reqs:
        pids, _ = tok.encode_one(r["text"], max_prompt)
        ids, mask = left_pad(pids, max_prompt, tok.pad_id)
        emb = opt.embed_tokens(params["opt"], jnp.asarray([ids], jnp.int32)
                               ).astype(emb_dtype)
        toks, valid = opt.generate(params["opt"], emb,
                                   jnp.asarray([mask], jnp.int32), cfg.opt,
                                   min(int(r.get("max_new", max_new)),
                                       max_new),
                                   eos_id=2, lora=lora,
                                   lora_scale=cfg.lora_scale)
        want = [int(t) for t in np.asarray(toks)[0][np.asarray(valid)[0]]]
        if want and want[-1] == 2:
            want = want[:-1]                   # CLI strips the fed EOS
        assert got[r["id"]]["tokens"] == want, r["id"]


def test_image_request_matches_blip2_generate(tiny_dataset):
    """An image request runs the BLIP-2 prompt assembly (32 query embeds
    + text at the CLI's fixed text length) and matches blip2.generate."""
    from garbage_classification_rca_tpu.cli.blip2_common import (
        blip_preprocess_image, left_pad)
    from garbage_classification_rca_tpu.models.vlm import blip2

    max_prompt, max_new = 24, 4
    img = None
    for root, _, files in os.walk(tiny_dataset):
        for f in files:
            if f.endswith(".jpg"):
                img = os.path.join(root, f)
                break
        if img:
            break
    assert img
    text = "Question: which bin? Answer:"
    out = _serve([{"id": "i0", "text": text, "image": img}],
                 [f"--max_prompt={max_prompt}",
                  f"--max_new_tokens={max_new}", "--serve_slots=1"])
    got = {d["id"]: d for d in out}

    cfg, params, lora, tok = _oracle_setup(max_prompt)
    t_len = max_prompt - cfg.qformer.n_query
    pids, _ = tok.encode_one(text, t_len)
    ids, mask = left_pad(pids, t_len, tok.pad_id)
    pix = blip_preprocess_image(img)[None].astype(np.uint8)
    from garbage_classification_rca_tpu.cli.blip2_common import normalize_clip
    toks, valid = blip2.generate(params, np.asarray(
        normalize_clip(jnp.asarray(pix))), jnp.asarray([ids], jnp.int32),
        jnp.asarray([mask], jnp.int32), cfg, lora=lora,
        max_new_tokens=max_new, eos_id=2)
    want = [int(t) for t in np.asarray(toks)[0][np.asarray(valid)[0]]]
    if want and want[-1] == 2:
        want = want[:-1]
    assert got["i0"]["tokens"] == want


def test_bad_requests_are_reported_not_fatal():
    # max_prompt=16 > tiny n_query=8 so this exercises the image-IO
    # error path, not the too-small-max_prompt gate (tested below)
    out = _serve([{"id": "x", "text": "a", "image": "/does/not/exist.jpg"},
                  {"id": "y", "text": "ok"}],
                 ["--max_prompt=16", "--max_new_tokens=2",
                  "--serve_slots=1"])
    got = {d["id"]: d for d in out}
    assert "error" in got["x"] and "tokens" not in got["x"]
    assert got["y"]["n_tokens"] >= 1


def _serve_raw(raw, argv):
    from garbage_classification_rca_tpu.cli import serve

    out = io.StringIO()
    rc = serve.main(argv + [f"--vocab_dir={BPE_VOCAB}"],
                    stdin=io.StringIO(raw), stdout=out)
    assert rc == 0
    return [json.loads(l) for l in out.getvalue().splitlines()]


def test_malformed_and_invalid_requests_keep_serving(capsys):
    """Protocol errors must never kill (or silently drain) the server:
    non-object JSON lines — including `null`, which must not look like
    the reader's EOF — go to stderr; parsed-but-invalid fields come back
    as {"id", "error"} lines; a valid request AFTER all of them is still
    served (the round-3 review found each of these crashing the loop)."""
    raw = "\n".join([
        "42", "null", '"hello"', "{not json",
        json.dumps({"id": "bad1", "text": "x", "max_new": 0}),
        json.dumps({"id": "bad2", "text": 5}),
        json.dumps({"id": "bad3", "text": "x", "max_new": "five"}),
        json.dumps({"id": "bad4", "text": "x", "max_new": True}),
        json.dumps({"id": "bad5", "text": "x", "image": 7}),
        json.dumps({"id": "ok", "text": "fine"}),
    ]) + "\n"
    out = _serve_raw(raw, ["--max_prompt=16", "--max_new_tokens=2",
                           "--serve_slots=1"])
    got = {d["id"]: d for d in out}
    for bad in ("bad1", "bad2", "bad3", "bad4", "bad5"):
        assert "error" in got[bad] and "tokens" not in got[bad], bad
    assert got["ok"]["n_tokens"] >= 1      # null didn't terminate the loop
    errs = capsys.readouterr().err
    assert errs.count("bad request line") == 4


def test_image_rejected_when_max_prompt_too_small(tiny_dataset):
    """--max_prompt <= n_query leaves no room for prompt text next to
    the projected query embeddings: image requests get an error line
    (instead of a late ValueError killing the server); text-only
    requests in the same session still serve."""
    img = None
    for root, _, files in os.walk(tiny_dataset):
        for f in files:
            if f.endswith(".jpg"):
                img = os.path.join(root, f)
                break
        if img:
            break
    out = _serve([{"id": "i0", "text": "a", "image": img},
                  {"id": "t0", "text": "ok"}],
                 ["--max_prompt=8", "--max_new_tokens=2",
                  "--serve_slots=1"])   # tiny n_query == 8
    got = {d["id"]: d for d in out}
    assert "max_prompt" in got["i0"]["error"]
    assert got["t0"]["n_tokens"] >= 1


def test_tp_mesh_shape_same_stream():
    """--mesh_shape=data:1,model:2 must Megatron-TP-shard the OPT tower
    through place_blip2_params and reproduce the replicated stream
    bit-for-bit (the docstring's TP promise, previously unwired)."""
    reqs = [{"id": "r0", "text": "Question: which bin? Answer:"}]
    flags = ["--max_prompt=16", "--max_new_tokens=4", "--serve_slots=1"]
    assert (_serve(reqs, flags)
            == _serve(reqs, flags + ["--mesh_shape=data:1,model:2"]))
