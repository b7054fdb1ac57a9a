"""TPU-native serving layer (beyond the reference's 1-token eval).

`engine.GenerationServer` — continuous batching over a fixed slot grid:
per-request prefill + insert, chunked batched decode, immediate slot
refill on EOS/completion. Exactness contract: every request's token
stream equals `opt.generate` run on that request alone.
"""

from .engine import GenerationServer, ServedRequest  # noqa: F401
