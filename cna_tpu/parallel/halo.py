"""Halo-exchange diffusion: cell-sharded SpMM with explicit collectives.

The GSPMD path (``parallel.sharded``) lets XLA all-gather the full
(N, S) diffusion state every step — simple and correct, but it moves the
whole state over the interconnect regardless of how many rows each shard
actually references.  This module is the explicit alternative (SURVEY
§5.7): each shard owns a contiguous cell block; per step it sends only
the **ghost rows** its neighbors reference, via one ``all_to_all`` inside
``shard_map``, then runs a purely local ELL SpMM against
[own rows ‖ received ghosts].

The exchange plan (which rows each shard pair needs) is computed once on
host from the ELL structure; per-pair ghost lists are padded to the
global max so the collective has a static shape.  On cluster-ordered
manifold graphs ghosts are a small fraction of N; on expander-like
graphs the plan degenerates towards an all-gather — never worse in bytes
than the dense exchange by more than the padding factor.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from . import mesh as meshlib


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Per-shard exchange plan + locally-remapped graph.

    Shapes (D = shards, Nd = rows per shard, K = ELL width, G = padded
    per-pair ghost count):

      local_indices: (D, Nd, K) int32 — ELL neighbor ids remapped into the
        extended local layout [0, Nd + D*G): own rows first, then ghosts
        grouped by source shard.
      local_weights: (D, Nd, K).
      send_idx: (D, D, G) int32 — send_idx[j, i] = rows (local to shard j)
        that shard i needs; padded slots resend row 0 (ignored by i).
      colsums: (D, Nd) column-sum normalizer rows owned by each shard.
      n_cells: true cell count (before shard padding).
    """

    local_indices: jnp.ndarray
    local_weights: jnp.ndarray
    send_idx: jnp.ndarray
    colsums: jnp.ndarray
    n_cells: int = dataclasses.field(metadata=dict(static=True))
    n_ghosts: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.local_indices.shape[0]

    @property
    def shard_rows(self) -> int:
        return self.local_indices.shape[1]

    @property
    def ghosts_per_pair(self) -> int:
        return self.send_idx.shape[2]

    def ghost_fraction(self) -> float:
        """True (unpadded) ghost rows exchanged per step, as a fraction of
        all cells.  << 1 on locality-ordered graphs means the halo moves
        only boundary rows; -> (D-1) means the plan has degenerated to an
        all-gather and the GSPMD path would move the same bytes."""
        return self.n_ghosts / max(self.n_cells, 1)


def build_halo_plan(indices, weights, colsums, n_shards, pad_to=8) -> HaloPlan:
    """Build the exchange plan from host ELL arrays.

    ``indices``/``weights``: (N, K) ELL graph; ``colsums``: (N,).
    Rows are padded so N divides evenly; padding rows have no edges.
    """
    indices = np.asarray(indices)
    weights = np.asarray(weights)
    colsums = np.asarray(colsums)
    n, k = indices.shape
    nd = -(-n // n_shards)
    nd = ((nd + pad_to - 1) // pad_to) * pad_to
    n_pad = nd * n_shards
    if n_pad > n:
        indices = np.pad(indices, ((0, n_pad - n), (0, 0)))
        weights = np.pad(weights, ((0, n_pad - n), (0, 0)))
        colsums = np.pad(colsums, (0, n_pad - n), constant_values=1.0)

    owner = indices // nd  # (N, K) owning shard of each referenced row

    # per (consumer shard i, producer shard j): sorted unique remote rows
    ghost_lists: list[list[np.ndarray]] = []
    g_max = 1
    n_ghosts = 0
    for i in range(n_shards):
        row_lo, row_hi = i * nd, (i + 1) * nd
        idx_i = indices[row_lo:row_hi]
        own_i = owner[row_lo:row_hi]
        per_producer = []
        for j in range(n_shards):
            if j == i:
                per_producer.append(np.zeros(0, dtype=np.int64))
                continue
            needed = np.unique(idx_i[own_i == j])
            per_producer.append(needed)
            g_max = max(g_max, len(needed))
            n_ghosts += len(needed)
        ghost_lists.append(per_producer)
    g = ((g_max + pad_to - 1) // pad_to) * pad_to

    send_idx = np.zeros((n_shards, n_shards, g), dtype=np.int32)
    local_indices = np.zeros((n_shards, nd, k), dtype=np.int32)
    local_weights = np.zeros((n_shards, nd, k), dtype=weights.dtype)
    for i in range(n_shards):
        row_lo = i * nd
        idx_i = indices[row_lo : row_lo + nd].copy()
        own_i = owner[row_lo : row_lo + nd]
        # own rows -> [0, Nd)
        remap = idx_i - row_lo
        for j in range(n_shards):
            if j == i:
                continue
            ghosts = ghost_lists[i][j]
            send_idx[j, i, : len(ghosts)] = ghosts - j * nd  # local to j
            # ghosts from producer j land at [Nd + j*G, Nd + j*G + len)
            base = nd + j * g
            lookup = np.searchsorted(ghosts, idx_i[own_i == j])
            remap[own_i == j] = base + lookup
        local_indices[i] = remap
        local_weights[i] = weights[row_lo : row_lo + nd]

    return HaloPlan(
        local_indices=jnp.asarray(local_indices),
        local_weights=jnp.asarray(local_weights),
        send_idx=jnp.asarray(send_idx),
        colsums=jnp.asarray(colsums.reshape(n_shards, nd)),
        n_cells=n,
        n_ghosts=n_ghosts,
    )


def place_plan(plan: HaloPlan, mesh) -> HaloPlan:
    """Shard the plan's arrays over the mesh's ``cells`` axis.

    Every per-shard leading axis (D) lines up with the cell shards:
    ``local_indices``/``local_weights``/``colsums`` row blocks live on the
    shard that computes them; ``send_idx`` is sharded over the PRODUCER
    axis so each shard holds exactly what it must send.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from . import mesh as meshlib

    rows = NamedSharding(mesh, P(meshlib.CELLS))
    return dataclasses.replace(
        plan,
        local_indices=jax.device_put(plan.local_indices, rows),
        local_weights=jax.device_put(plan.local_weights, rows),
        send_idx=jax.device_put(plan.send_idx, rows),
        colsums=jax.device_put(plan.colsums, rows),
    )


def _halo_step_local(t_local, idx, w, send_idx_row):
    """Per-shard body: exchange ghosts, SpMM against [own ‖ ghosts]."""
    s_dim = t_local.shape[-1]
    send_idx_row = send_idx_row[0]  # shard_map passes a (1, D, G) block
    send = jnp.take(t_local, send_idx_row, axis=0)  # (D, G, S)
    recv = jax.lax.all_to_all(send, meshlib.CELLS, 0, 0, tiled=False)
    ext = jnp.concatenate([t_local, recv.reshape(-1, s_dim)], axis=0)
    gathered = jnp.take(ext, idx, axis=0)  # (Nd, K, S)
    return jnp.einsum("nk,nks->ns", w, gathered,
                      preferred_element_type=t_local.dtype)


@partial(jax.jit, static_argnames=("mesh", "self_weight"))
def halo_diffusion_step(s, plan: HaloPlan, mesh, self_weight=1.0):
    """One diffusion step over the cells axis with explicit halo exchange.

    ``s``: (D*Nd, S) state in shard-padded layout (rows beyond
    ``plan.n_cells`` are zero padding).  Matches
    ``ops.spmm.diffusion_step`` exactly on the true rows.
    """
    d, nd = plan.colsums.shape
    s_dim = s.shape[1]
    colsums_flat = plan.colsums.reshape(-1) + self_weight
    t = s / colsums_flat[:, None]

    step = shard_map(
        _halo_step_local,
        mesh=mesh,
        in_specs=(P(meshlib.CELLS), P(meshlib.CELLS), P(meshlib.CELLS),
                  # send_idx: shard over the PRODUCER axis (axis 0): shard j
                  # holds send_idx[j] = what it sends to every consumer
                  P(meshlib.CELLS)),
        out_specs=P(meshlib.CELLS),
        check_vma=False,
    )
    idx_flat = plan.local_indices.reshape(d * nd, -1)
    w_flat = plan.local_weights.reshape(d * nd, -1)
    out = step(t, idx_flat, w_flat, plan.send_idx)
    return out + self_weight * t
