"""Device-mesh utilities and batched multi-sequence odometry.

The reference parallelizes evaluation with a bash process fleet — independent
`offline_odometry` processes per (sequence, config) job
(`launch/oxford/eval/utils/{start_workers,worker}`; SURVEY.md §2.3). The
TPU-native equivalent is data parallelism over a `jax.sharding.Mesh`: a batch
of sequences (or segments of one long sequence) is sharded across chips on a
`data` axis and stepped in lockstep under one jit — odometry is serial in
time per sequence, so cross-chip scale comes from many sequences, intra-chip
speed from the fixed-shape per-frame kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfear_radarodometry_code_public_tpu.config import CFEARConfig
from cfear_radarodometry_code_public_tpu.models import odometry


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_batched_runner(cfg: CFEARConfig, mesh: Mesh, axis: str = "data"):
    """Build (init_fn, step_chunk_fn) for a sharded batch of sequences.

    States and frame chunks carry a leading batch axis sharded over `axis`;
    each call scans a chunk of frames for every sequence in the batch.
    """
    step = odometry.make_step(cfg)
    bootstrap = odometry.make_bootstrap(cfg)

    def shard_batch(tree):
        return jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*( (axis,) + (None,) * (a.ndim - 1))))),
            tree)

    def init_fn(batch: int) -> odometry.OdometryState:
        states = jax.vmap(lambda _: odometry.init_state(cfg))(jnp.arange(batch))
        return shard_batch(states)

    @jax.jit
    def bootstrap_batch(states, first_images):
        """(B, ...) states + (B, A, R) first frames -> initialized states."""
        return jax.vmap(bootstrap)(states, first_images)

    @jax.jit
    def step_chunk(states, images):
        """states: (B, ...) sharded; images: (B, T, A, R) -> outputs (B, T, ...)."""

        def scan_one(state, imgs):
            return jax.lax.scan(step, state, imgs)

        return jax.vmap(scan_one)(states, images)

    return init_fn, step_chunk, shard_batch, bootstrap_batch


class MultiSequenceRunner:
    """Host driver for a sharded batch of sequences (the "fleet")."""

    def __init__(self, cfg: CFEARConfig, batch: int, mesh: Optional[Mesh] = None,
                 chunk: int = 16):
        self.cfg = cfg
        self.chunk = chunk
        self.mesh = mesh or make_mesh()
        (self.init_fn, self.step_chunk, self.shard_batch,
         self.bootstrap_batch) = make_batched_runner(cfg, self.mesh)
        self.states = self.init_fn(batch)
        self.outputs: list = []

    def process(self, images: np.ndarray) -> None:
        """images: (B, T, A, R) uint8."""
        if images.shape[1] and not bool(np.asarray(
                self.states.initialized).any()):
            first = self.shard_batch(jnp.asarray(images[:, 0]))
            self.states, out0 = self.bootstrap_batch(self.states, first)
            self.outputs.append(jax.tree.map(
                lambda a: np.asarray(a)[:, None], out0))
            images = images[:, 1:]
        b, t = images.shape[:2]
        for i in range(0, t - t % self.chunk, self.chunk):
            blk = self.shard_batch(jnp.asarray(images[:, i:i + self.chunk]))
            self.states, out = self.step_chunk(self.states, blk)
            self.outputs.append(jax.tree.map(np.asarray, out))
        rem = t % self.chunk
        if rem:
            blk = self.shard_batch(jnp.asarray(images[:, t - rem:]))
            self.states, out = self.step_chunk(self.states, blk)
            self.outputs.append(jax.tree.map(np.asarray, out))

    def trajectories(self) -> np.ndarray:
        out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=1),
                           *self.outputs)
        b = out.pose.shape[0]
        return np.stack([
            odometry.compose_trajectory(
                jax.tree.map(lambda a, i=i: a[i], out)) for i in range(b)])
