"""Batched host->device input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=N,
pin_memory=True)`` (main_image.py:495-517) with:

  * a thread pool decoding/resizing images into fixed-shape uint8 arrays
    (threads, not processes: PIL/cv2 release the GIL in their C cores),
  * fixed-shape batches — the dataset tail is padded to the full batch and
    masked downstream (no recompiles, no ragged collectives),
  * an async device-put double buffer so H2D copies overlap compute.

Batch dict layout mirrors the reference sample structure
(CustomImageTextFolder.py:338-343) flattened to device-friendly arrays:
  image: uint8 [B, H, W, 3]       (normalize fused on device)
  input_ids / attention_mask: int32 [B, L]   (when text is requested)
  label: int32 [B]
  valid: int32 [B]  (1 = real sample, 0 = tail padding)
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .images import load_rgb
from .manifest import Manifest
from .tokenizer import BaseTokenizer


def batch_indices(n: int, batch_size: int, *, shuffle: bool,
                  seed: int = 0, order: Optional[np.ndarray] = None
                  ) -> List[np.ndarray]:
    """Static-shape batch plan: every batch has `batch_size` entries; the
    tail repeats index 0 with valid=0 downstream."""
    idx = np.arange(n) if order is None else np.asarray(order)
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    out = []
    for start in range(0, len(idx), batch_size):
        chunk = idx[start:start + batch_size]
        out.append(chunk)
    return out


class _ProducerError:
    """Carries a producer-thread exception across the queue so the
    consumer raises instead of silently ending the epoch early."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class ImageTextBatcher:
    """Decodes batches of (image, text, label) on host threads."""

    def __init__(self, manifest: Manifest, image_size: Tuple[int, int],
                 tokenizer: Optional[BaseTokenizer] = None,
                 seq_len: int = 64, extended_desc: bool = False,
                 workers: int = 8, with_images: bool = True):
        self.m = manifest
        self.image_size = image_size
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self.extended = extended_desc
        self.with_images = with_images
        self.pool = cf.ThreadPoolExecutor(max_workers=workers) if with_images else None

    def close(self):
        if self.pool:
            self.pool.shutdown(wait=False)

    @staticmethod
    def _pil_pad_resize(raw: List[np.ndarray], h: int, w: int) -> np.ndarray:
        """Decoded-array route: native C++ batch pad+resize (cv2-exact
        fixed-point bilinear, multithreaded), falling back to the
        per-image Python path when the lib is unavailable."""
        from .. import native

        out = native.pad_resize_batch(raw, h, w, target_ar=w / h)
        if out is None:
            from .images import pad_to_aspect_ratio, resize_linear

            out = np.stack([
                resize_linear(pad_to_aspect_ratio(im, w / h), h, w)
                for im in raw])
        return out

    def make_batch(self, indices: np.ndarray, batch_size: int) -> Dict[str, np.ndarray]:
        n = len(indices)
        padded = np.concatenate([indices, np.zeros(batch_size - n, np.int64)]) \
            if n < batch_size else indices
        samples = [self.m.samples[i] for i in padded]
        batch: Dict[str, np.ndarray] = {
            "label": np.asarray([s.label for s in samples], np.int32),
            "valid": np.asarray([1] * n + [0] * (batch_size - n), np.int32),
        }
        if self.with_images:
            h, w = self.image_size
            from .. import native

            out = None
            if native.decode_enabled() and native.get_decode_lib() is not None:
                # opt-in fused C++ JPEG decode+pad+resize (bit-identical
                # to the PIL route, tests/test_native.py); per-image
                # fallback below keeps non-JPEG/corrupt files on PIL
                blobs = list(self.pool.map(
                    lambda s: open(s.image_path, "rb").read(), samples))
                res = native.decode_pad_resize_batch(blobs, h, w,
                                                     target_ar=w / h)
                if res is not None:
                    out, ok = res
                    bad = np.flatnonzero(~ok)
                    if bad.size:
                        # refused files (non-JPEG/CMYK/truncated) fall
                        # back to PIL as ONE pooled decode + batched
                        # pad/resize — a serial per-image loop here would
                        # negate the native speedup on mixed-format sets
                        raw = list(self.pool.map(
                            lambda i: load_rgb(samples[i].image_path),
                            bad))
                        out[bad] = self._pil_pad_resize(raw, h, w)
            if out is None:
                raw = list(self.pool.map(
                    lambda s: load_rgb(s.image_path), samples))
                out = self._pil_pad_resize(raw, h, w)
            batch["image"] = out.astype(np.uint8, copy=False)
        if self.tokenizer is not None:
            texts = [s.effective_text(self.extended) for s in samples]
            enc = self.tokenizer.encode_batch(texts, self.seq_len)
            batch["input_ids"] = enc.input_ids
            batch["attention_mask"] = enc.attention_mask
        return batch

    def iter_batches(self, batch_size: int, *, shuffle: bool = False,
                     seed: int = 0, order: Optional[np.ndarray] = None,
                     prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        """Yield fixed-shape batches, preparing `prefetch` batches ahead on a
        background thread."""
        plans = batch_indices(len(self.m), batch_size, shuffle=shuffle,
                              seed=seed, order=order)
        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        stop = threading.Event()

        def put_polling(item) -> bool:
            # bounded puts that watch the stop event: if the consumer
            # abandoned mid-epoch (bench smoke, early break) the queue may
            # stay full and a plain put() would pin this thread (and its
            # prefetched batches) for the process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def producer():
            end: object = None
            try:
                for plan in plans:
                    if stop.is_set():
                        return
                    put_polling(self.make_batch(plan, batch_size))
            except BaseException as e:  # noqa: BLE001 — surfaced below
                # a decode error (corrupt image, vanished file) must FAIL
                # the epoch, not silently truncate it: a partial eval would
                # report deflated accuracy with exit code 0
                end = _ProducerError(e)
            finally:
                if not put_polling(end):
                    try:   # consumer stopped draining; best-effort sentinel
                        q.put_nowait(end)
                    except queue.Full:
                        pass

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "input pipeline failed while decoding a batch"
                    ) from item.exc
                yield item
        finally:
            stop.set()
            # drain so a producer blocked in put() wakes up and exits
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def device_prefetch(host_iter, mesh=None, depth: int = 2, sharding=None):
    """Move host batches to device ahead of consumption (double buffer).

    With a mesh, the leading dim is sharded over axis 'data'; otherwise a
    plain device_put. Overlaps H2D DMA with TPU compute. `depth` is the
    lookahead window (--prefetch_depth); an explicit `sharding` overrides
    the mesh-derived batch sharding (the train engine passes its stacked
    microbatch sharding).
    """
    import jax
    from ..parallel.mesh import batch_sharding

    if sharding is None and mesh is not None:
        sharding = batch_sharding(mesh)

    def put(b):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), b)
        return jax.tree_util.tree_map(jax.device_put, b)

    return lookahead(map(put, host_iter), depth)


def lookahead(it, depth: int = 2):
    """Generic pull-ahead buffer: materialize up to ``depth`` upcoming
    items while the caller consumes the current one. device_prefetch
    without the put — for iterators whose items are already
    device-placed (the multihost streams yield put_global results), so
    host decode + H2D of the next batch overlaps the in-flight step.

    depth <= 0 means OFF: the iterator is passed through untouched (no
    pull-ahead at all), so --prefetch_depth=0 really disables lookahead
    when debugging batch ordering or HBM pressure (ADVICE r3)."""
    if depth <= 0:
        yield from it
        return
    buf: List = []
    it = iter(it)
    try:
        for _ in range(depth):
            buf.append(next(it))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(next(it))
        except StopIteration:
            pass
        yield nxt
