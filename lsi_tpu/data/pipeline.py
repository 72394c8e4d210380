"""Input pipeline: batching + device-side prefetch.

Capability parity with the reference's TF1 queue-runner input pipelines
(``lsi/data/kitti/…``, ``lsi/data/syn/…``): dataset iterators yield
(src, trg, K, pose[, gt]) batches, here as a pytree ``Batch`` streamed to
device HBM with double-buffered ``jax.device_put`` prefetch — the TPU-native
replacement for queue threads. When a sharding is provided, each global
batch is laid out directly onto the data mesh (host -> per-device shards),
so the train step reads fully-sharded arrays with no all-gather.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from lsi_tpu.config import DataConfig


@flax.struct.dataclass
class Batch:
    src_image: jnp.ndarray       # (B, H, W, 3)
    trg_image: jnp.ndarray       # (B, H, W, 3)
    intrinsics: jnp.ndarray      # (B, 3, 3)
    pose_src2trg: jnp.ndarray    # (B, 4, 4)
    gt_disparity: Optional[jnp.ndarray] = None   # (B, H, W, 1) or None
    gt_valid: Optional[jnp.ndarray] = None       # (B, H, W, 1) or None
    # Target-view GT (SYNTHIA right-camera depth / synthetic analytic):
    # enables the occluded-region eval — rendered-depth accuracy on pixels
    # only the LDI's deeper layers can explain (SURVEY.md §3.4).
    trg_gt_disparity: Optional[jnp.ndarray] = None  # (B, H, W, 1) or None
    trg_gt_valid: Optional[jnp.ndarray] = None      # (B, H, W, 1) or None


def decode_batch(batch: Batch) -> Batch:
    """On-device decode of storage dtypes (jit-safe, no-op for f32 data).

    Materialized datasets ship uint8 RGB and float16 disparities over the
    host->device link (4x less wire traffic than decoded f32 — the axon
    tunnel is the binding constraint at flagship resolution); train/eval
    steps call this first, so the division by 255 runs at HBM rate and
    fuses into the first consumer.
    """
    def img(x):
        if x is not None and jnp.issubdtype(x.dtype, jnp.integer):
            return x.astype(jnp.float32) / 255.0
        return x

    def f32(x):
        if x is not None and x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x

    return Batch(
        src_image=img(batch.src_image),
        trg_image=img(batch.trg_image),
        intrinsics=f32(batch.intrinsics),
        pose_src2trg=f32(batch.pose_src2trg),
        gt_disparity=f32(batch.gt_disparity),
        gt_valid=f32(batch.gt_valid),
        trg_gt_disparity=f32(batch.trg_gt_disparity),
        trg_gt_valid=f32(batch.trg_gt_valid),
    )


def _example_stream(cfg: DataConfig, seed: int, repeat: bool):
    """Infinite (or single-pass) stream of single-example dicts."""
    if cfg.dataset == "synthetic":
        from lsi_tpu.data import synthetic
        if cfg.root:
            # Materialized dataset on disk (lsi_tpu.data.materialize):
            # stream shards instead of generating — online generation
            # cannot feed the chip at flagship resolution.
            from lsi_tpu.data.materialize import cached_example_stream
            yield from cached_example_stream(cfg, seed, repeat)
            return
        # The synthetic train/val "split" is a disjoint seed range: val
        # scenes are drawn from generator streams a train run never visits.
        if cfg.split == "val":
            seed = seed + 0x5EED_0FF5
        kind = getattr(cfg, "synthetic_scene", "two_plane")

        def keys():
            epoch = 0
            while True:
                for i in range(1024):
                    yield (epoch, i)
                if not repeat:
                    return
                epoch += 1

        # Sequential generation, overlapped with device compute by the
        # _Prefetcher fill thread. Parallel generation was measured and
        # REJECTED on this host: threads don't scale (the numpy scene
        # renderers hold the GIL) and process pools lose outright (the
        # parent-side result unpickle serializes at > the per-scene cost —
        # 47 -> 38 scenes/s with 4 procs at 128x256). The win came from
        # vectorizing the renderer itself (222 -> 21 ms/scene; see
        # data/synthetic.py). Per-index seeding is kept so the stream is a
        # pure function of (seed, epoch, index).
        for epoch, i in keys():
            yield synthetic.scene_example(kind, seed, epoch, i,
                                          cfg.height, cfg.width)
    elif cfg.dataset == "kitti":
        from lsi_tpu.data import kitti
        yield from kitti.example_stream(cfg, seed, repeat)
    elif cfg.dataset == "synthia":
        from lsi_tpu.data import synthia
        yield from synthia.example_stream(cfg, seed, repeat)
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")


def _batch_stream(cfg: DataConfig, seed: int, repeat: bool):
    """Stack example dicts into numpy batches of the global batch size."""
    buf = []
    for ex in _example_stream(cfg, seed, repeat):
        buf.append(ex)
        if len(buf) == cfg.batch_size:
            stacked = {k: np.stack([e[k] for e in buf])
                       for k in buf[0]}
            yield Batch(**{k: stacked[k] for k in stacked})
            buf = []


class _Prefetcher:
    """Background thread that keeps `depth` batches resident on device.

    The host thread overlaps scene generation / disk IO and the host->HBM
    transfer with device compute — the role TF1 queue runners played in the
    reference, minus the mutable queue graph ops.
    """

    def __init__(self, it: Iterator[Batch], depth: int, sharding=None):
        self._it = it
        self._sharding = sharding
        self._q: collections.deque = collections.deque()
        self._sem_space = threading.Semaphore(depth)
        self._sem_items = threading.Semaphore(0)
        self._done = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _put(self, batch: Batch) -> Batch:
        if self._sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding) if x is not None
                else None, batch)
        return jax.tree.map(
            lambda x: jax.device_put(x) if x is not None else None, batch)

    def _fill(self):
        # Any worker-side failure (bad dataset root, corrupt image, device
        # transfer error) must surface in the consumer, not hang it: record
        # the exception and ALWAYS release the item semaphore on exit so
        # __next__ wakes up and re-raises.
        try:
            for batch in self._it:
                self._sem_space.acquire()
                self._q.append(self._put(batch))
                self._sem_items.release()
        except BaseException as e:  # noqa: BLE001 — propagated to consumer
            self._error = e
        finally:
            self._done = True
            self._sem_items.release()

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        self._sem_items.acquire()
        if not self._q:
            # Terminal state (exhausted or failed): keep it re-raisable on
            # every subsequent call instead of blocking forever.
            self._sem_items.release()
            if self._error is not None:
                raise self._error
            raise StopIteration
        item = self._q.popleft()
        self._sem_space.release()
        return item


def make_dataset(cfg: DataConfig, seed: int = 0, repeat: bool = True,
                 sharding=None) -> Iterator[Batch]:
    """Build the input iterator for a config.

    Args:
      cfg: data configuration (dataset name, size, batch).
      seed: deterministic stream seed.
      repeat: loop forever (training) or one pass (eval).
      sharding: optional jax.sharding.Sharding for direct host->mesh layout
        of every array (batch-axis sharding for DP training).
    """
    return _Prefetcher(_batch_stream(cfg, seed, repeat),
                       depth=max(1, cfg.prefetch), sharding=sharding)
