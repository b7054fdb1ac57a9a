"""Sequence parallelism (SP) for the 512-token text towers.

The reference never shards a model at all (SURVEY §2.3: TP/PP/SP/EP
absent; sequences are capped at 512 tokens by each encoder's
max_position_embeddings, CVPR_code/text_models.py:39-40), so SP is a
beyond-reference capability: shard the TOKEN axis of the encoder
activations over mesh axis ``seq`` so per-token work — embeddings,
LayerNorms, and the FFN matmuls that dominate DistilBERT's FLOPs — runs
on 1/n of the sequence per chip, with one tiled ``all_gather`` of K and V
per layer for attention (``jax.shard_map`` + ``lax.all_gather`` riding
ICI). At 512 tokens the per-layer K/V gather moves 2 x B x 512 x H bf16
values — small against the FFN matmuls it parallelises.

This is the Megatron-SP / all-gather flavour, the right one for short
encoder sequences: ring attention (blockwise K/V rotation) only pays at
multi-thousand-token context, which this workload never reaches
(SURVEY §5 "Long-context / sequence parallelism: absent"). SP composes
with data parallelism — pass a ``data:d,seq:s`` mesh and the batch axis
shards too.

Expert parallelism (EP): the reference model zoo contains no MoE layer
anywhere (grep: no gating/expert modules in models.py, text_models.py,
multimodal_model.py), so no production model needs it — but the
parallelism matrix is completed beyond-reference by parallel/ep.py
(top-k MoE FFN with the expert bank sharded over mesh axis ``expert``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.text.encoder_common import attention_bias
from ..nn import core as nn
from .mesh import DATA_AXIS

SEQ_AXIS = "seq"


def _mha_local_q_global_kv(q, kg, vg, bias, heads: int):
    """Attention with a local query block against the gathered global K/V.

    q: [B, Ln, D] (this shard's tokens), kg/vg: [B, L, D] (all tokens),
    bias: additive [B, 1, 1, L]. fp32 softmax like the unsharded path
    (encoder_common.multi_head_attention) so SP is numerics-identical.
    """
    b, ln, d = q.shape
    l = kg.shape[1]
    hd = d // heads
    q = q.reshape(b, ln, heads, hd)
    k = kg.reshape(b, l, heads, hd)
    v = vg.reshape(b, l, heads, hd)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", w, v)
    return out.reshape(b, ln, d)


def postnorm_encode_sp(params: Dict[str, Any], input_ids, attention_mask,
                       mesh: Mesh, *, heads: int, ln_eps: float,
                       act=nn.gelu) -> jnp.ndarray:
    """Sequence-parallel forward of a DistilBERT-layout post-norm encoder.

    ``params`` is the ``init_encoder``/``convert_encoder`` dict
    (word_emb / pos_emb / ln_emb / layers[q,k,v,out,ln_att,fc1,fc2,
    ln_ffn]). The token axis of ``input_ids`` / ``attention_mask``
    [B, L] is sharded over mesh axis 'seq' (L must divide evenly); the
    batch axis additionally shards over 'data' when the mesh has one.
    Returns the full last_hidden_state [B, L, 768-alike], numerically
    identical to the unsharded ``encode`` (eval path: the reference
    freezes its text towers and adds no dropout inside the encoder,
    text_models.py:23-34).
    """
    l = input_ids.shape[1]
    n_seq = dict(zip(mesh.axis_names, mesh.devices.shape)).get(SEQ_AXIS, 1)
    if l % n_seq != 0:
        raise ValueError(
            f"sequence length {l} does not divide over seq:{n_seq}; pad "
            "to a multiple (tokenizers already pad to max_length)")
    dp: Optional[str] = DATA_AXIS if DATA_AXIS in mesh.axis_names else None

    def shard_fn(p, ids, mask):
        ln_local = ids.shape[1]
        i = jax.lax.axis_index(SEQ_AXIS)
        h = nn.embedding(p["word_emb"], ids)
        pos = i * ln_local + jnp.arange(ln_local)
        h = h + nn.embedding(p["pos_emb"], pos[None, :])
        h = nn.layernorm(p["ln_emb"], h, eps=ln_eps)
        mask_g = jax.lax.all_gather(mask, SEQ_AXIS, axis=1, tiled=True)
        bias = attention_bias(mask_g)
        for lp in p["layers"]:
            q = nn.linear(lp["q"], h)
            k = nn.linear(lp["k"], h)
            v = nn.linear(lp["v"], h)
            kg = jax.lax.all_gather(k, SEQ_AXIS, axis=1, tiled=True)
            vg = jax.lax.all_gather(v, SEQ_AXIS, axis=1, tiled=True)
            att = _mha_local_q_global_kv(q, kg, vg, bias, heads)
            h = nn.layernorm(lp["ln_att"], h + nn.linear(lp["out"], att),
                             eps=ln_eps)
            f = nn.linear(lp["fc2"], act(nn.linear(lp["fc1"], h)))
            h = nn.layernorm(lp["ln_ffn"], h + f, eps=ln_eps)
        return h

    tok = P(dp, SEQ_AXIS)
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), tok, tok),
                       out_specs=P(dp, SEQ_AXIS, None))
    return fn(params, input_ids, attention_mask)


def distilbert_encode_sp(encoder_params, input_ids, attention_mask,
                         mesh: Mesh) -> jnp.ndarray:
    """DistilBERT ``encode`` (models/text/distilbert.py) under SP."""
    from ..models.text import distilbert as db
    return postnorm_encode_sp(encoder_params, input_ids, attention_mask,
                              mesh, heads=db.HEADS, ln_eps=db.LN_EPS)


def distilbert_classify_sp(params, input_ids, attention_mask,
                           mesh: Mesh) -> jnp.ndarray:
    """Eval logits of the DistilBERT classifier (CLS pool + head) under
    SP — the sequence-parallel twin of ``distilbert.apply`` at
    train=False (dropout identity)."""
    h = distilbert_encode_sp(params["encoder"], input_ids, attention_mask,
                             mesh)
    return nn.linear(params["head"], h[:, 0])
