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
import os
import queue
import sys
import threading

import numpy as np

_EOF = object()  # reader-thread end-of-stream sentinel (a JSON `null`
#                  request must NOT look like EOF, so not None)


def _build_embedders(cfg, params, args, tok, mesh):
    """Fixed-shape jitted prompt builders (compile once each). Image
    prompts embed as a BATCH of ``serve_slots`` (the EVA vision tower at
    bs1 wastes the MXU; requests pulled from the queue in the same tick
    embed together — padding rows are duplicates, sliced off after);
    text-only prompts are a single embedding gather, done at bs1.
    Returns embed_requests: [req, ...] -> [(embeds [L, H] on-device,
    mask [L] np.int32), ...] in the same order."""
    import jax
    import jax.numpy as jnp

    from ..models.vlm import blip2 as blip2_mod
    from ..models.vlm import opt as opt_mod
    from .blip2_common import left_pad, normalize_clip

    from ..config import jnp_compute_dtype

    n_query = cfg.qformer.n_query
    # image requests are rejected upstream when max_prompt <= n_query
    # (no room for text next to the query embeddings), so the max() here
    # is never load-bearing — it only keeps the closure constructible
    t_len_img = max(args.max_prompt - n_query, 1)
    emb_dtype = params["opt"]["embed_tokens"]["w"].dtype
    compute_dtype = jnp_compute_dtype(args.compute_dtype)
    g = max(args.serve_slots, 1)        # vision-tower batch width

    @jax.jit
    def embed_img(params, pix, ids, mask):
        e, m = blip2_mod.prompt_embeds(params,
                                       normalize_clip(pix, compute_dtype),
                                       ids, mask, cfg)
        return e.astype(emb_dtype), m

    @jax.jit
    def embed_txt(params, ids, mask):
        return (opt_mod.embed_tokens(params["opt"], ids).astype(emb_dtype),
                mask)

    def _tokenize(req, t_len):
        pids, _ = tok.encode_one(req.get("text", ""), t_len)
        return left_pad(pids, t_len, tok.pad_id)

    def embed_requests(reqs, pixs):
        """pixs[i]: decoded uint8 [224,224,3] for image requests, else
        None (host IO — the only fallible part — happens in the caller,
        per request). Pure device work from here on."""
        out = [None] * len(reqs)
        img_idx = [i for i in range(len(reqs)) if pixs[i] is not None]
        for base in range(0, len(img_idx), g):
            grp = img_idx[base:base + g]
            pad = g - len(grp)
            pix = np.stack([pixs[i] for i in grp] + [pixs[grp[0]]] * pad)
            toks_masks = [_tokenize(reqs[i], t_len_img) for i in grp]
            ids = np.asarray([t[0] for t in toks_masks]
                             + [toks_masks[0][0]] * pad, np.int32)
            msk = np.asarray([t[1] for t in toks_masks]
                             + [toks_masks[0][1]] * pad, np.int32)
            e, m = embed_img(params, jnp.asarray(pix), jnp.asarray(ids),
                             jnp.asarray(msk))
            m = np.asarray(m, np.int32)
            for j, i in enumerate(grp):
                out[i] = (e[j], m[j])
        for i, r in enumerate(reqs):
            if out[i] is not None:
                continue
            ids, mask = _tokenize(r, args.max_prompt)
            e, m = embed_txt(params, jnp.asarray([ids], jnp.int32),
                             jnp.asarray([mask], jnp.int32))
            out[i] = (e[0], np.asarray(m[0], np.int32))
        return out

    return embed_requests


def _reader(stream, q):
    """stdin thread: parsed request dicts -> q; _EOF on stream end.

    Lines that don't parse, or parse to a non-object (a bare number,
    string, or null — there is no usable "id" to echo), are protocol
    errors reported on stderr; they must never crash or terminate the
    server (PARITY.md serve-CLI contract)."""
    for line in stream:
        line = line.strip()
        if not line:
            continue
        try:
            item = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad request line: {e}"}),
                  file=sys.stderr, flush=True)
            continue
        if not isinstance(item, dict):
            print(json.dumps({"error": "bad request line: expected a JSON "
                              f"object, got {type(item).__name__}"}),
                  file=sys.stderr, flush=True)
            continue
        q.put(item)
    q.put(_EOF)


def _validate_request(item, img_ok, n_query):
    """Field errors -> message for an {"id":..., "error":...} line (the
    submit path must never raise on user input)."""
    txt = item.get("text", "")
    if not isinstance(txt, str):
        return f"'text' must be a string, got {type(txt).__name__}"
    img = item.get("image")
    if img is not None and not isinstance(img, str):
        return f"'image' must be a path string, got {type(img).__name__}"
    mn = item.get("max_new", 1)
    if isinstance(mn, bool) or not isinstance(mn, int) or mn < 1:
        return f"'max_new' must be a positive integer, got {mn!r}"
    if img and not img_ok:
        return (f"image prompts need --max_prompt > n_query={n_query} "
                "(the projected query embeddings leave no room for text)")
    return None


def main(argv=None, stdin=None, stdout=None):
    import jax

    if jax.process_count() > 1:
        # same restriction as the other VLM CLIs: the server's submit
        # path device_puts per-request embeddings without per-host
        # sharding; run single-process (TP via --mesh_shape applies)
        raise SystemExit(
            "multi-host (GC_RCA_MULTIHOST) is not supported by the serve "
            "CLI — run it single-process")

    from ..config import args_parser
    from ..parallel.mesh import make_mesh, shard_params
    from ..serving.engine import GenerationServer
    from .blip2_common import build_blip2, place_blip2_params

    args = args_parser(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    cfg, params, lora, tok = build_blip2(args)
    if args.model_path and os.path.isdir(args.model_path):
        from ..train.engine import load_orbax

        restored, _ = load_orbax(args.model_path)
        lora = restored["lora"]
    if args.int8_weights:
        from ..ops.quant import quantize_opt_weights

        params = dict(params, opt=quantize_opt_weights(params["opt"]))
    mesh = make_mesh(args.mesh_shape)
    # model-axis meshes Megatron-TP-shard the OPT tower (the docstring's
    # --mesh_shape=data:1,model:N promise); LoRA stays replicated (tiny)
    params = place_blip2_params(mesh, params)
    lora = shard_params(mesh, lora)
    img_ok = args.max_prompt > cfg.qformer.n_query
    if not img_ok:
        print(f"warning: --max_prompt={args.max_prompt} <= n_query="
              f"{cfg.qformer.n_query}; image requests will be rejected "
              "with error lines", file=sys.stderr, flush=True)

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
    embed_requests = _build_embedders(cfg, params, args, tok, mesh)

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

    from .blip2_common import blip_preprocess_image

    while not eof or srv.has_work:
        # pull every request already waiting; block only when idle
        pending, pixs = [], []
        while not eof:
            try:
                item = q.get(block=not srv.has_work and not pending)
            except queue.Empty:
                break
            if item is _EOF:
                eof = True
                break
            err = _validate_request(item, img_ok, cfg.qformer.n_query)
            if err is None:
                try:
                    # image IO is the other fallible part — per request
                    pix = (blip_preprocess_image(
                        item["image"]).astype(np.uint8)
                        if item.get("image") else None)
                except (OSError, ValueError, TypeError) as exc:
                    err = f"{type(exc).__name__}: {exc}"
            if err is not None:
                print(json.dumps({"id": item.get("id"), "error": err}),
                      file=stdout, flush=True)
                continue
            pending.append(item)
            pixs.append(pix)
        if pending:
            # image prompts embed as a batch (vision tower at bs1 wastes
            # the MXU); submissions stay in arrival order so uid-derived
            # sampling keys are reproducible from the request log
            for item, (e, m) in zip(pending,
                                    embed_requests(pending, pixs)):
                uid = srv.submit(e, m, max_new=min(int(item.get(
                    "max_new", max_new)), max_new))
                uid_to_id[uid] = item.get("id")
        emit(srv.step())
    emit(srv.drain())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
