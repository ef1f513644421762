"""Gather-count optimization experiment: group-of-angles 3x3 patches.

Round-2 measured the candidate-scoring kernel to be gather-ROW-COUNT bound:
the per-(angle, beam) 2x2-patch row-gather (A*B = 8000 rows) costs more than
the entire dense select/exp phase, and halving row count beat every other
optimization tried.  This module halves it ~G times more by exploiting
angular coherence: across G consecutive angles a beam at range r moves by
only r * G * angular_resolution (<= 0.3 m at the defaults), so ONE 3x3-cell
patch gathered at the group's reference position covers every (angle,
candidate) cell of the whole group.  Rows drop from A*B to (A/G)*B; the
dense phase pays a 9-way (vs 4-way) select.

Correctness bound (asserted by the dispatcher): the group's per-beam sweep
plus the translation window must fit inside the 3x3 patch,
  range_max * G * angular_res + 2 * linear_size <= 2 * cell,
with the same clip+bounds-mask edge handling as the 2x2 path
(matcher.prepare_neighborhood).  Equivalence vs the 2x2 path is pinned by
tests/test_gather_opt.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.ndt import grid as ndt_grid


def max_group(config: ScanMatcherConfig, range_max: float) -> int:
    """Largest angle-group size G whose sweep fits the 3x3 patch."""
    slack = (2.0 * config.ndt_resolution
             - 2.0 * config.search_linear_size
             - 0.02)  # margin for fp rounding
    per_angle = range_max * config.search_angular_resolution
    if per_angle <= 0 or slack <= 0:
        return 1
    return max(1, int(slack / per_angle))


def packed_patch_table3(grid: ndt_grid.NDTGrid, width: int):
    """[H*W, 72] table: row i packs the 3x3 cell patch with cell i at the
    bottom-left — cells (i + dy*width + dx) for dy, dx in 0..2, y-major,
    each as the 8 packed_cell_table fields.  Same edge-wrap caveat as
    packed_patch_table (clip base to [0, W-3] x [0, H-3] + bounds mask)."""
    t = ndt_grid.packed_cell_table(grid)
    return jnp.concatenate(
        [jnp.roll(t, -(dy * width + dx), 0)
         for dy in range(3) for dx in range(3)], axis=1)


def candidate_scores_grouped(config: ScanMatcherConfig,
                             grid: ndt_grid.NDTGrid, spts, smask, pose,
                             dths, dls, group: int, packed_table3=None):
    """[A, L, L] candidate scores with (A/group)*B gather rows.

    Semantics identical to matcher._candidate_scores_local (same clip +
    candidate-level bounds masking); only the gather granularity differs.
    """
    W, H = config.grid_cells_x, config.grid_cells_y
    L = dls.shape[0]
    A = dths.shape[0]
    B = spts.shape[0]
    dtype = spts.dtype
    G = group
    A_pad = -(-A // G) * G

    # Beam world positions for EVERY angle (cheap dense math, no gather).
    # Pad with the LAST real angle, not zero: the group reference is the
    # min beam position over the group, and a zero-padded dth=0 in the
    # tail group would pull the reference toward the lattice center,
    # breaking the 3x3-patch coverage bound for the real tail angles
    # whenever group does not divide num_angles.
    th = pose[2] + jnp.pad(dths, (0, A_pad - A), mode="edge")
    c, s = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    px, py = spts[:, 0][None, :], spts[:, 1][None, :]
    bx = c * px - s * py + pose[0]                         # [A_pad, B]
    by = s * px + c * py + pose[1]

    cell = grid.cell_size
    # Group reference: the min beam position over the group's angles (the
    # patch must start at/below every angle's cell).
    gx = bx.reshape(A_pad // G, G, B).min(axis=1)          # [A/G, B]
    gy = by.reshape(A_pad // G, G, B).min(axis=1)
    ix0 = jnp.floor((gx + dls[0] - grid.origin[0]) / cell).astype(jnp.int32)
    iy0 = jnp.floor((gy + dls[0] - grid.origin[1]) / cell).astype(jnp.int32)
    ixc = jnp.clip(ix0, 0, W - 3)
    iyc = jnp.clip(iy0, 0, H - 3)
    # Patch-internal cell boundaries (x: base+1, base+2; same for y).
    cr_x1 = grid.origin[0] + (ixc.astype(dtype) + 1.0) * cell   # [A/G, B]
    cr_x2 = cr_x1 + cell
    cr_y1 = grid.origin[1] + (iyc.astype(dtype) + 1.0) * cell
    cr_y2 = cr_y1 + cell

    flat = iyc * W + ixc                                   # [A/G, B]
    if packed_table3 is None:
        packed_table3 = packed_patch_table3(grid, W)       # [H*W, 72]
    nb = packed_table3[flat]                               # [A/G, B, 72]
    nb = nb.reshape(flat.shape[0], B, 9, 8)

    ok = (nb[..., 5] > 0.5) & smask[None, :, None]
    pack = jnp.concatenate([nb[..., :5], ok[..., None].astype(nb.dtype)],
                           axis=-1)                        # [A/G, B, 9, 6]

    # Broadcast group quantities to per-angle [A_pad, ...].
    def up(x):
        return jnp.repeat(x, G, axis=0)

    cr_x1, cr_x2, cr_y1, cr_y2 = map(up, (cr_x1, cr_x2, cr_y1, cr_y2))
    pack = up(pack)                                        # [A_pad, B, 9, 6]

    # Candidate coordinates [A_pad, Lc, B] (shared x/y offset lattice).
    wxc = bx[:, None, :] + dls[None, :, None]
    wyc = by[:, None, :] + dls[None, :, None]
    jx1 = wxc >= cr_x1[:, None, :]
    jx2 = wxc >= cr_x2[:, None, :]
    jy1 = wyc >= cr_y1[:, None, :]
    jy2 = wyc >= cr_y2[:, None, :]
    x_lo, x_hi = grid.origin[0], grid.origin[0] + W * cell
    y_lo, y_hi = grid.origin[1], grid.origin[1] + H * cell
    in_gx = ((wxc >= x_lo) & (wxc < x_hi))[:, :, None, :]  # [A, Lx, 1, B]
    in_gy = ((wyc >= y_lo) & (wyc < y_hi))[:, None, :, :]  # [A, 1, Ly, B]

    jx1f = jx1[:, :, None, :, None]                        # [A, Lx, 1, B, 1]
    jx2f = jx2[:, :, None, :, None]
    jy1f = jy1[:, None, :, :, None]                        # [A, 1, Ly, B, 1]
    jy2f = jy2[:, None, :, :, None]

    p = pack.reshape(A_pad, B, 3, 3, 6)[:, None, None]     # [A,1,1,B,3,3,6]

    def sel_x(row):                                        # [A,1,1,B,3,6] ->
        lo = jnp.where(jx1f, row[..., 1, :], row[..., 0, :])
        return jnp.where(jx2f, row[..., 2, :], lo)         # [A,Lx,1,B,6]

    r0 = sel_x(p[..., 0, :, :])
    r1 = sel_x(p[..., 1, :, :])
    r2 = sel_x(p[..., 2, :, :])
    lo = jnp.where(jy1f, r1, r0)
    psel = jnp.where(jy2f, r2, lo)                         # [A,Lx,Ly,B,6]

    mx, my = psel[..., 0], psel[..., 1]
    i00, i01, i11 = psel[..., 2], psel[..., 3], psel[..., 4]
    valid = (psel[..., 5] > 0.5) & in_gx & in_gy
    qx = wxc[:, :, None, :] - mx
    qy = wyc[:, None, :, :] - my
    e = -0.5 * (i00 * qx * qx + 2.0 * i01 * qx * qy + i11 * qy * qy)
    pt_scores = jnp.where(valid, jnp.exp(jnp.minimum(e, 0.0)), 0.0)
    return -jnp.sum(pt_scores, axis=-1)[:A]                # [A, Lx, Ly]
