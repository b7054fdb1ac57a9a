"""Continuous-batching generation server CLI (JSONL stdin -> stdout).

The reference has no serving surface at all (its only generation is the
1-token constrained eval, blip_2_training.py:296-297). This CLI puts the
beyond-reference serving stack (serving/engine.py::GenerationServer — slot
continuous batching, per-request budgets, opt-in int8 KV cache and
weight-only int8 decode) behind a user-facing process:

  echo '{"id": 1, "text": "Question: what bin? Answer:"}' | \\
  python -m garbage_classification_rca_tpu.cli.serve \\
      --model_path=blip2.pth --vocab_dir=... --max_new_tokens=16

Protocol — one JSON object per line:
  request : {"id": <any json>, "text": "<prompt>",
             "image": "/path.jpg" (optional — BLIP-2 visual prompt),
             "max_new": <int> (optional per-request budget)}
  response: {"id": ..., "text": "<decoded>", "tokens": [...],
             "n_tokens": N}   (one line per request, AS IT FINISHES —
                               completion order, not submission order)

Requests stream: a reader thread feeds the scheduler, so decode ticks for
already-running slots continue while the host waits on stdin (true
continuous batching, not submit-all-then-drain). With an "image" the
prompt is the BLIP-2 assembly (32 projected query embeddings + text,
blip2.prompt_embeds); text-only prompts serve the bare OPT tower.
Sampling (--gen_temperature/top_k/top_p) derives per-request keys on
device (fold_in(rng, uid)); streams are bit-identical to opt.generate
run standalone on each request (tests/test_serving.py contract).

Flags: --serve_slots, --max_prompt, --steps_per_sync size the slot grid;
--kv_cache_dtype=int8 / --int8_weights are the decode-bandwidth levers;
--mesh_shape=data:1,model:N TP-shards the tower (parallel/tp.py).
"""

from __future__ import annotations

import json
import queue
import sys
import threading

import numpy as np


def _build_embedders(cfg, params, args, tok, mesh):
    """Two fixed-shape jitted prompt builders (compile once each):
    image+text -> BLIP-2 embeds [1, 32+Lt, H]; text-only -> token embeds
    [1, max_prompt, H]. Returns (embed_request, n_query)."""
    import jax
    import jax.numpy as jnp

    from ..models.vlm import blip2 as blip2_mod
    from ..models.vlm import opt as opt_mod
    from .blip2_common import left_pad, normalize_clip

    n_query = cfg.qformer.n_query
    t_len_img = max(args.max_prompt - n_query, 1)
    emb_dtype = params["opt"]["embed_tokens"]["w"].dtype

    @jax.jit
    def embed_img(params, pix, ids, mask):
        e, m = blip2_mod.prompt_embeds(params, normalize_clip(pix), ids,
                                       mask, cfg)
        return e.astype(emb_dtype), m

    @jax.jit
    def embed_txt(params, ids, mask):
        return (opt_mod.embed_tokens(params["opt"], ids).astype(emb_dtype),
                mask)

    def embed_request(req: dict):
        """-> (embeds [L, H] jax.Array on device, mask [L] np.int32)."""
        text = req.get("text", "")
        if req.get("image"):
            from .blip2_common import blip_preprocess_image

            pix = blip_preprocess_image(req["image"])[None].astype(np.uint8)
            pids, _ = tok.encode_one(text, t_len_img)
            ids, mask = left_pad(pids, t_len_img, tok.pad_id)
            e, m = embed_img(params, jnp.asarray(pix),
                             jnp.asarray([ids], jnp.int32),
                             jnp.asarray([mask], jnp.int32))
        else:
            pids, _ = tok.encode_one(text, args.max_prompt)
            ids, mask = left_pad(pids, args.max_prompt, tok.pad_id)
            e, m = embed_txt(params, jnp.asarray([ids], jnp.int32),
                             jnp.asarray([mask], jnp.int32))
        return e[0], np.asarray(m[0], np.int32)

    return embed_request


def _reader(stream, q):
    """stdin thread: parsed request dicts -> q; None = EOF sentinel."""
    for line in stream:
        line = line.strip()
        if not line:
            continue
        try:
            q.put(json.loads(line))
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad request line: {e}"}),
                  file=sys.stderr, flush=True)
    q.put(None)


def main(argv=None, stdin=None, stdout=None):
    import jax

    from ..config import args_parser
    from ..parallel.mesh import make_mesh, shard_params
    from ..serving.engine import GenerationServer
    from .blip2_common import build_blip2

    args = args_parser(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    cfg, params, lora, tok = build_blip2(args)
    if args.model_path and __import__("os").path.isdir(args.model_path):
        from ..train.engine import load_orbax

        restored, _ = load_orbax(args.model_path)
        lora = restored["lora"]
    if args.int8_weights:
        from ..ops.quant import quantize_opt_weights

        params = dict(params, opt=quantize_opt_weights(params["opt"]))
    mesh = make_mesh(args.mesh_shape)
    params = shard_params(mesh, params)
    lora = shard_params(mesh, lora)

    sampler = None
    rng = None
    if args.gen_temperature > 0:
        from ..ops.sampling import SamplerConfig

        sampler = SamplerConfig(temperature=args.gen_temperature,
                                top_k=args.gen_top_k, top_p=args.gen_top_p)
        rng = jax.random.PRNGKey(args.gen_seed)
    max_new = max(args.max_new_tokens, 1)
    srv = GenerationServer(params["opt"], cfg.opt, slots=args.serve_slots,
                           max_prompt=args.max_prompt, max_new=max_new,
                           eos_id=2, lora=lora, lora_scale=cfg.lora_scale,
                           sampler=sampler, rng=rng,
                           cache_dtype=args.kv_cache_dtype or None,
                           steps_per_sync=args.steps_per_sync)
    embed_request = _build_embedders(cfg, params, args, tok, mesh)

    q: queue.Queue = queue.Queue()
    t = threading.Thread(target=_reader, args=(stdin, q), daemon=True)
    t.start()
    uid_to_id = {}
    eof = False

    def emit(finished):
        for r in finished:
            toks = list(r.tokens)
            if toks and toks[-1] == 2:          # strip the fed EOS
                toks = toks[:-1]
            out = {"id": uid_to_id.pop(r.uid), "text": tok.decode(toks),
                   "tokens": [int(x) for x in toks], "n_tokens": len(toks)}
            print(json.dumps(out), file=stdout, flush=True)

    while not eof or srv.has_work:
        # pull every request already waiting; block only when idle
        pulled = 0
        while not eof:
            try:
                item = q.get(block=not srv.has_work and pulled == 0)
            except queue.Empty:
                break
            if item is None:
                eof = True
                break
            try:
                e, m = embed_request(item)
            except (OSError, ValueError) as exc:
                print(json.dumps({"id": item.get("id"),
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      file=stdout, flush=True)
                continue
            uid = srv.submit(e, m, max_new=min(int(item.get(
                "max_new", max_new)), max_new))
            uid_to_id[uid] = item.get("id")
            pulled += 1
        emit(srv.step())
    emit(srv.drain())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
