"""Typed configuration + argparse shim.

Re-implements every flag of the reference CLI (reference: options.py:8-116)
as a typed dataclass, and folds the per-architecture hard-coded
hyper-parameter ladders (reference: main_image.py:49-58 `eff_net_sizes`,
main_image.py:269-359 / calculate_test_accuracy_image.py:152-216 if/elif
tables) into declarative tables.

Known reference defects fixed here on purpose (SURVEY.md section 2):
  * fusion-model constructor arity bugs -> every fusion knob is a keyword
    field with a default;
  * per-arch config is data, not an if/elif ladder.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass
class RunConfig:
    """One flat config mirroring the reference argparse namespace.

    Field names match the reference flags exactly so that reference shell
    scripts (slurm_files/**/*.sh) work verbatim against our CLIs.
    """

    # core training schedule (options.py:11-34)
    epochs: int = 100
    ft_epochs: int = 15
    lr: float = 0.001
    fraction_lr: float = 5.0
    reg: float = 1e-2
    model_dropout: float = 0.6
    label_smoothing: float = 0.0

    # dataset locations (options.py:13-16, 59-61)
    dataset_folder_name: str = ""
    dataset_folder_name_val: str = ""
    base_path: str = ""

    # model selection (options.py:35-36, 69-70)
    image_model: str = "b4"
    text_model: str = "distilbert"
    late_fusion: str = "gated"

    # fusion knobs (options.py:78-91) — keyword-defaulted (bug fix, SURVEY §2)
    reverse: bool = False
    features_only: bool = False
    cross_attention_only: bool = False
    num_neurons_FC: int = 256

    # modality dropout (options.py:19-22)
    image_text_dropout: float = 0.33
    image_prob_dropout: float = 0.7

    # transfer learning / class balancing (options.py:27-30, 99-102)
    tl: bool = True
    balance_weights: bool = False
    balanced_sampler: bool = False

    # batching (options.py:41-54)
    acc_steps: int = 0
    acc_steps_FT: int = 0
    batch_size: int = 16
    batch_size_FT: int = 16

    # optimizer (options.py:56-57)
    opt: str = "sgd"

    # augmentation (options.py:63-67, 104-110)
    calculate_dataset_stats: bool = False
    prob_aug: float = 0.6
    use_synonyms: bool = False
    prob_aug_text: float = 0.6

    # eval / checkpoints (options.py:38-39, 112-113)
    model_path: str = ""
    classifier_weights: Optional[str] = None

    # extended descriptions (options.py:93-97)
    extended_desc_train: Optional[str] = None
    extended_desc_val: Optional[str] = None

    # run description (options.py:75-76)
    name: Optional[str] = None

    # ---- TPU-native extensions (not in the reference) ----
    mesh_shape: str = "data:-1"       # e.g. "data:8" or "data:4,model:2"
    compute_dtype: str = "bfloat16"    # matmul/conv compute dtype on TPU
    # param STORAGE dtype. "" = follow the path's default policy: eval
    # CLIs store weights in compute_dtype (bf16 halves HBM + tunnel
    # upload), train CLIs keep fp32 master weights. An explicit value
    # overrides either (utils/dtype.resolve_param_dtype).
    param_dtype: str = ""
    eval_batch_size: int = 0           # 0 -> per-arch table value
    seed: int = 42
    wandb: bool = False                # wandb optional behind a flag (SURVEY §5)
    prefetch_depth: int = 2            # host->device double-buffer depth
    data_workers: int = 8              # host-side decode worker threads
    profile_dir: str = ""              # jax.profiler trace output (eval CLIs)
    resume_from: str = ""              # VLM trainers: path to a RESUME dir
    #   (the image/text/fusion trainers resume via --model_path=.../RESUME;
    #   the BLIP-2/Q-Former trainers keep --model_path for the HF base
    #   checkpoint, so full resume takes this separate flag)
    seq_len: int = 0                   # token bucket; 0 -> 64 (the garbage
                                       # texts are a few words; the reference
                                       # pads to the full 512-1024 positions —
                                       # set --seq_len=512 for exact-parity
                                       # padding at ~8x the text FLOPs)
    vocab_dir: str = ""                # dir with vocab.txt / vocab.json +
                                       # merges.txt; defaults to the model
                                       # checkpoint's directory
    max_new_tokens: int = 1            # blip2_test decode length: 1 =
                                       # reference-exact constrained decode
                                       # (blip_2_training.py:296); >1 = the
                                       # KV-cache generate serving path +
                                       # find_closest_string mapping
    fsdp: bool = False                 # ZeRO-3-style sharding of params +
                                       # optimizer state over the 'data'
                                       # axis (parallel/fsdp.py); numerics
                                       # identical to replicated dp
    gen_temperature: float = 0.0       # blip2_test --max_new_tokens>1
                                       # sampling: 0 = greedy (reference
                                       # parity); >0 = HF do_sample
                                       # semantics (ops/sampling.py) — the
                                       # reference's host LLMs use 0.4
    gen_top_k: int = 0                 # 0 disables
    gen_top_p: float = 1.0
    gen_seed: int = 0                  # PRNG seed for sampled decoding
    kv_cache_dtype: str = ""           # ""=param dtype; "int8" quantizes
                                       # the serving KV cache per slot
                                       # (ops/quant.py): 2-4x less decode
                                       # HBM traffic + cache memory
    int8_weights: bool = False         # weight-only int8 on the OPT
                                       # tower for multi-token decode
                                       # (ops/quant.py quantize_opt_
                                       # weights; 1.3-1.45x measured) —
                                       # numerics contract test_quant.py
    serve_slots: int = 8               # cli.serve: continuous-batching
                                       # slot-grid width
    max_prompt: int = 100              # cli.serve: prompt budget incl.
                                       # the 32 BLIP-2 query embeddings
                                       # (reference pads prompts to 100,
                                       # blip_2_training.py:66)
    steps_per_sync: int = 8            # cli.serve: decode ticks between
                                       # host syncs (swept on-chip: 16
                                       # best for throughput, lower =
                                       # lower queue-to-slot latency)
    resume_every_steps: int = 0        # >0: also write the RESUME
                                       # checkpoint every N optimizer
                                       # windows (mid-epoch preemption on
                                       # long FT epochs replays at most N
                                       # windows instead of the whole
                                       # epoch); bit-identical continuation
                                       # like the per-epoch RESUME
    hf_internal_dropout: bool = False  # reproduce the reference's
                                       # HF-encoder-internal train-mode
                                       # dropout (the frozen towers stay
                                       # in train() mode, CVPR_code/
                                       # text_models.py:23-34, so p=0.1
                                       # hidden/attention dropout is
                                       # ACTIVE during training there);
                                       # opt-in — eval + default train
                                       # trajectories are unchanged

    def replace(self, **kw) -> "RunConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Per-architecture run tables
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ArchRunSpec:
    """Per-arch input geometry + batch envelope.

    Mirrors the reference's hard-coded ladders: resize (H, W) from
    main_image.py:49-58, train/FT batch + acc-steps from main_image.py:269-359,
    eval batch from calculate_test_accuracy_image.py:152-216. The TPU eval
    batch default is our own (larger; v5e HBM >> V100-32GB for inference).
    """

    input_size: Tuple[int, int]        # (H, W) after pad-to-AR + resize
    train_batch: int = 128
    ft_batch: int = 16
    acc_steps: int = 0
    eval_batch: int = 256


# reference: main_image.py:269-359 (train) and
# calculate_test_accuracy_image.py:152-216 (eval batch sizes)
IMAGE_ARCHS: dict[str, ArchRunSpec] = {
    # input_size is (H, W); the eff-net entries are non-square, from the
    # reference's eff_net_sizes dict (main_image.py:49-58, stored (W, H)
    # and read WIDTH=size[0], HEIGHT=size[1]).
    "b0":            ArchRunSpec((224, 256), 128, 64, 0, 256),
    "b4":            ArchRunSpec((380, 384), 128, 16, 6, 128),
    "b5":            ArchRunSpec((456, 489), 64, 8, 12, 64),
    "eff_v2_small":  ArchRunSpec((384, 384), 128, 16, 6, 128),
    "eff_v2_medium": ArchRunSpec((480, 480), 128, 24, 12, 64),
    "eff_v2_large":  ArchRunSpec((480, 480), 64, 8, 24, 32),
    "res18":         ArchRunSpec((224, 224), 128, 128, 0, 256),
    "res50":         ArchRunSpec((224, 224), 128, 64, 0, 256),
    "res152":        ArchRunSpec((224, 224), 128, 32, 2, 128),
    "convnext":      ArchRunSpec((224, 224), 128, 64, 2, 256),
    "mb":            ArchRunSpec((224, 224), 128, 128, 0, 256),
    "transformer_B16": ArchRunSpec((224, 224), 128, 200, 0, 64),  # v5e sweep: 64 -> 2625 img/s (128 -> 2413, 192 -> 2280)
    "transformer_L16": ArchRunSpec((224, 224), 128, 52, 3, 128),
    "shuffle_net":   ArchRunSpec((224, 224), 128, 52, 3, 256),
}

# reference: main_text.py:274-305 (batch envelopes), text_models.py (max len)
TEXT_ARCHS: dict[str, ArchRunSpec] = {
    "distilbert": ArchRunSpec((0, 0), 128, 64, 0, 256),
    "bert":       ArchRunSpec((0, 0), 64, 32, 2, 256),
    "roberta":    ArchRunSpec((0, 0), 64, 32, 2, 256),
    "bart":       ArchRunSpec((0, 0), 32, 2, 24, 64),
    "gpt2":       ArchRunSpec((0, 0), 18, 4, 12, 128),
    "mobilebert": ArchRunSpec((0, 0), 128, 64, 0, 256),
    "mobile_bert": ArchRunSpec((0, 0), 128, 64, 0, 256),  # reference spelling
}

# reference: multimodal_model.py:407-408 — multimodal image size fixed 480x480
MULTIMODAL_IMAGE_SIZE = (480, 480)

# reference: calculate_test_accuracy_both.py:159 uses bs=16 on V100; ours
MULTIMODAL_EVAL_BATCH = 128   # bs sweep on v5e: 32->1181, 64->1437, 128->1582 img/s

LATE_FUSION_STRATEGIES = (
    "gated", "classic", "normalized", "clip", "MM_RCA",
    "hierarchical", "bimodal",
)


def image_input_size(image_model: str) -> Tuple[int, int]:
    return IMAGE_ARCHS[image_model].input_size


# ---------------------------------------------------------------------------
# argparse shim — flag-for-flag with reference options.py:8-116
# ---------------------------------------------------------------------------

def jnp_compute_dtype(compute_dtype: str):
    """--compute_dtype -> jnp dtype: the ONE mapping shared by every CLI
    (argparse restricts the value via choices=, so this cannot fall
    through to a silent default)."""
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[compute_dtype]


def _add_bool_flag(p: argparse.ArgumentParser, name: str, default: bool, help_: str):
    names = [f"--{name}"]
    if "_" in name:
        # dashed alias: MM_RCA_simple_concat.sh writes --features-only
        # (broken against the reference's own argparse; accepted here)
        names.append(f"--{name.replace('_', '-')}")
    p.add_argument(*names, dest=name, action=argparse.BooleanOptionalAction,
                   default=default, help=help_)


def build_parser() -> argparse.ArgumentParser:
    d = RunConfig()
    p = argparse.ArgumentParser(
        description="TPU-native Garbage_Classification_RCA rebuild")
    p.add_argument('--epochs', type=int, default=d.epochs)
    p.add_argument('--dataset_folder_name', type=str, default=d.dataset_folder_name)
    p.add_argument('--dataset_folder_name_val', type=str, default=d.dataset_folder_name_val)
    p.add_argument('--lr', type=float, default=d.lr)
    p.add_argument('--image_text_dropout', type=float, default=d.image_text_dropout)
    p.add_argument('--image_prob_dropout', type=float, default=d.image_prob_dropout)
    p.add_argument('--reg', type=float, default=d.reg)
    p.add_argument('--model_dropout', type=float, default=d.model_dropout)
    _add_bool_flag(p, 'tl', d.tl, "use transfer learning")
    _add_bool_flag(p, 'balance_weights', d.balance_weights, "weighted CE")
    p.add_argument('--ft_epochs', type=int, default=d.ft_epochs)
    p.add_argument('--fraction_lr', type=float, default=d.fraction_lr)
    p.add_argument('--image_model', type=str, default=d.image_model)
    p.add_argument('--text_model', type=str, default=d.text_model)
    p.add_argument('--model_path', type=str, default=d.model_path)
    p.add_argument('--acc_steps', type=int, default=d.acc_steps)
    p.add_argument('--acc_steps_FT', type=int, default=d.acc_steps_FT)
    p.add_argument('--num_neurons_FC', type=int, default=d.num_neurons_FC)
    p.add_argument('--batch_size', type=int, default=d.batch_size)
    p.add_argument('--batch_size_FT', type=int, default=d.batch_size_FT)
    p.add_argument('--opt', type=str, default=d.opt)
    p.add_argument('--base_path', type=str, default=d.base_path)
    _add_bool_flag(p, 'calculate_dataset_stats', d.calculate_dataset_stats, "")
    p.add_argument('--prob_aug', type=float, default=d.prob_aug)
    p.add_argument('--late_fusion', type=str, default=d.late_fusion)
    p.add_argument('--label_smoothing', type=float, default=d.label_smoothing)
    p.add_argument('--name', type=str, default=d.name)
    _add_bool_flag(p, 'reverse', d.reverse, "use reverse cross-attention (RCA)")
    _add_bool_flag(p, 'features_only', d.features_only, "features-only head")
    _add_bool_flag(p, 'cross_attention_only', d.cross_attention_only, "RCA-only head")
    p.add_argument('--extended_desc_train', type=str, default=d.extended_desc_train)
    p.add_argument('--extended_desc_val', type=str, default=d.extended_desc_val)
    _add_bool_flag(p, 'balanced_sampler', d.balanced_sampler, "imbalanced sampler")
    _add_bool_flag(p, 'use_synonyms', d.use_synonyms, "text synonym augmentation")
    p.add_argument('--prob_aug_text', type=float, default=d.prob_aug_text)
    p.add_argument('--classifier_weights', type=str, default=d.classifier_weights)
    # TPU-native extensions
    p.add_argument('--mesh_shape', type=str, default=d.mesh_shape)
    p.add_argument('--compute_dtype', type=str, default=d.compute_dtype,
                   choices=["bfloat16", "float32"])
    p.add_argument('--param_dtype', type=str, default=d.param_dtype,
                   choices=["", "float32", "bfloat16"])
    p.add_argument('--eval_batch_size', type=int, default=d.eval_batch_size)
    p.add_argument('--seed', type=int, default=d.seed)
    _add_bool_flag(p, 'wandb', d.wandb, "log to wandb")
    p.add_argument('--prefetch_depth', type=int, default=d.prefetch_depth,
                   help="host->device lookahead window; 0 disables "
                        "pull-ahead entirely")
    p.add_argument('--data_workers', type=int, default=d.data_workers)
    p.add_argument('--profile_dir', type=str, default=d.profile_dir)
    p.add_argument('--resume_from', type=str, default=d.resume_from)
    p.add_argument('--resume_every_steps', type=int,
                   default=d.resume_every_steps,
                   help="also checkpoint RESUME every N optimizer windows "
                        "(0 = per-epoch only)")
    p.add_argument('--seq_len', type=int, default=d.seq_len)
    p.add_argument('--max_new_tokens', type=int, default=d.max_new_tokens)
    p.add_argument('--gen_temperature', type=float,
                   default=d.gen_temperature)
    p.add_argument('--gen_top_k', type=int, default=d.gen_top_k)
    p.add_argument('--gen_top_p', type=float, default=d.gen_top_p)
    p.add_argument('--gen_seed', type=int, default=d.gen_seed)
    p.add_argument('--kv_cache_dtype', type=str, default=d.kv_cache_dtype,
                   choices=["", "int8"])
    _add_bool_flag(p, 'int8_weights', d.int8_weights,
                   "weight-only int8 OPT tower for multi-token decode")
    p.add_argument('--serve_slots', type=int, default=d.serve_slots)
    p.add_argument('--max_prompt', type=int, default=d.max_prompt)
    p.add_argument('--steps_per_sync', type=int, default=d.steps_per_sync)
    p.add_argument('--vocab_dir', type=str, default=d.vocab_dir)
    _add_bool_flag(p, 'hf_internal_dropout', d.hf_internal_dropout,
                   "activate HF-encoder-internal p=0.1 train-mode dropout "
                   "(reference keeps frozen towers in train() mode); "
                   "consumed by main_text/main_both/blip2_train/"
                   "qformer_train — main_image rejects it (no such sites)")
    _add_bool_flag(p, 'fsdp', d.fsdp,
                   "shard params + optimizer state over the data axis")
    return p


def args_parser(argv=None) -> RunConfig:
    """Drop-in replacement for the reference ``args_parser`` (options.py:8)."""
    ns = build_parser().parse_args(argv)
    known = {f.name for f in dataclasses.fields(RunConfig)}
    return RunConfig(**{k: v for k, v in vars(ns).items() if k in known})
