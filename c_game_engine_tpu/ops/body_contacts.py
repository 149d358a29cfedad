"""Pallas TPU kernel: top-K support contacts of dynamic boxes vs the static
triangle soup.

Contact generation was the hot half of the rigid-body substep: the XLA
version gathered grid candidates per body ([D, L, B] random gathers, slow
on TPU) and ran lax.top_k. Here the whole (VMEM-resident) soup is scanned
in chunks per dynamic body, maintaining a running top-K (K=4) insertion
buffer — no gathers, no sort.

Outputs per env block: [8, D*K, B] components: depth, nx, ny, nz, px, py,
pz, pad. The impulse solver consumes them as dense [D, K, B] arrays in
physics/batched.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK, _closest_on_tri, _qrot

BLK = 128
K = 4

# barycentric weight below which the closest point counts as lying ON the
# corresponding edge (weights sum to 1, so this is a relative tolerance)
EDGE_EPS = 1e-3


def _feature_active(
    qtx, qty, qtz, ax, ay, az, bx, by, bz, cx, cy, cz, f_ab, f_bc, f_ca,
):
    """True where the closest point (qt) on triangle ABC sits on the
    interior or on an ACTIVE edge/vertex (compiler/edges.py flags).
    Barycentric classification: P = u*A + v*B + w*C; w~0 -> edge AB,
    u~0 -> edge BC, v~0 -> edge CA; a vertex is two edges at once and is
    active iff either incident edge is. Interior points count as active
    (their contact normal already equals the face normal)."""
    v0x, v0y, v0z = bx - ax, by - ay, bz - az
    v1x, v1y, v1z = cx - ax, cy - ay, cz - az
    v2x, v2y, v2z = qtx - ax, qty - ay, qtz - az
    d00 = v0x * v0x + v0y * v0y + v0z * v0z
    d01 = v0x * v1x + v0y * v1y + v0z * v1z
    d11 = v1x * v1x + v1y * v1y + v1z * v1z
    d20 = v2x * v0x + v2y * v0y + v2z * v0z
    d21 = v2x * v1x + v2y * v1y + v2z * v1z
    den = d00 * d11 - d01 * d01
    inv_den = 1.0 / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    v = (d11 * d20 - d01 * d21) * inv_den
    w = (d00 * d21 - d01 * d20) * inv_den
    u = 1.0 - v - w
    on_ab = w < EDGE_EPS
    on_bc = u < EDGE_EPS
    on_ca = v < EDGE_EPS
    interior = ~(on_ab | on_bc | on_ca)
    return (
        interior
        | (on_ab & (f_ab > 0.5))
        | (on_bc & (f_bc > 0.5))
        | (on_ca & (f_ca > 0.5))
    )


def _kernel(tri_ref, idx_ref, cnt_ref, body_ref, verts_ref, out_ref, *, D, is_box, V):
    for d in range(D):
        row = lambda k: body_ref[k, d : d + 1, :]  # [1, BLK]
        ccx, ccy, ccz = row(0), row(1), row(2)
        qx, qy, qz, qw = row(3), row(4), row(5), row(6)
        hx, hy, hz = row(7), row(8), row(9)
        on = row(10)
        bvx, bvy, bvz = row(11), row(12), row(13)

        neg = jnp.full_like(ccx, -1e30)
        zero = jnp.zeros_like(ccx)
        # running top-K: lists of ([1, BLK]) tuples, sorted desc by depth
        best = [[neg, zero, zero + 1.0, zero, zero, zero, zero] for _ in range(K)]

        # compacted per-(block, body) chunk list (ops/chunk_compact.py):
        # visits only chunks within the compile-time body margin of this
        # block's body-d AABB; inactive/padded body lanes get cnt 0
        def chunk_body(j, best_flat):
            return _chunk_do(idx_ref[0, d, j], best_flat)

        def _chunk_do(ci, best_flat):
            best = [best_flat[i * 7 : (i + 1) * 7] for i in range(K)]
            tri = tri_ref[pl.ds(ci * T_CHUNK, T_CHUNK), :]
            col = lambda k: tri[:, k : k + 1]
            ax, ay, az = col(0), col(1), col(2)
            bx, by, bz = col(3), col(4), col(5)
            cx, cy, cz = col(6), col(7), col(8)
            fnx, fny, fnz = col(9), col(10), col(11)
            tvalid = col(12)
            f_ab, f_bc, f_ca = col(13), col(14), col(15)

            qtx, qty, qtz = _closest_on_tri(ccx, ccy, ccz, ax, ay, az, bx, by, bz, cx, cy, cz)
            dx, dy, dz = ccx - qtx, ccy - qty, ccz - qtz
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            inv = 1.0 / jnp.maximum(dist, 1e-9)
            rx, ry, rz = dx * inv, dy * inv, dz * inv
            side = jnp.sign((ccx - ax) * fnx + (ccy - ay) * fny + (ccz - az) * fnz)
            side = jnp.where(side == 0, 1.0, side)
            flip = jnp.sign(rx * fnx + ry * fny + rz * fnz) * side
            flip = jnp.where(flip == 0, 1.0, flip)
            nx = jnp.where(dist > 1e-6, rx * flip, fnx * side)
            ny = jnp.where(dist > 1e-6, ry * flip, fny * side)
            nz = jnp.where(dist > 1e-6, rz * flip, fnz * side)

            # Active-edge fix (Jolt MeshShape; compiler/edges.py): rows in
            # GENUINE contact by the raw-normal test whose closest feature
            # is an INACTIVE (interior) edge/vertex get the face normal —
            # the center->closest direction there is a tessellation
            # artifact that jams sliding. Contact EXISTENCE keeps the raw
            # test (a face-normal depth ignores lateral distance and would
            # promote every nearby coplanar triangle to a phantom contact).
            fx, fy, fz = fnx * side, fny * side, fnz * side
            # support radius along -n (toward the triangle); is_box is a
            # compile-time per-body flag, so box bodies keep the closed
            # form and only hull bodies (leafy/orb/eraser/john) pay the
            # vert-cloud max (ConvexHullShape support, ModelLoader.c:323)
            lx, ly, lz = _qrot(-qx, -qy, -qz, qw, nx, ny, nz)
            if is_box[d]:
                r_sup = jnp.abs(lx) * hx + jnp.abs(ly) * hy + jnp.abs(lz) * hz
            else:
                r_sup = None
                for v in range(V):
                    s = -(
                        verts_ref[0, d, 3 * v] * lx
                        + verts_ref[0, d, 3 * v + 1] * ly
                        + verts_ref[0, d, 3 * v + 2] * lz
                    )
                    r_sup = s if r_sup is None else jnp.maximum(r_sup, s)

            signed = dx * nx + dy * ny + dz * nz
            depth = jnp.where(
                (tvalid > 0.5) & (on > 0.5), r_sup - signed, -1e30
            )
            # The NORMAL switches to the face normal; the DEPTH keeps the
            # raw measure (the owning triangle's interior closest point
            # always carries the true face-contact depth, so the fixed
            # contact only supplies the corrected constraint DIRECTION at
            # the seam anchor). Gated on ALIGNMENT (n.f > 0.7): a genuine
            # seam catch tilts the raw normal only slightly off the face
            # normal, while the lateral near-grazes of tall hulls (raw
            # depth ~0 at far-side anchors) must NOT become face contacts —
            # un-gated they push resting leafy bodies sideways forever
            # (measured: 2 bodies awake in every env, -26% steps/s on
            # shapes).
            feat_act = _feature_active(
                qtx, qty, qtz, ax, ay, az, bx, by, bz, cx, cy, cz,
                f_ab, f_bc, f_ca,
            )
            align = nx * fx + ny * fy + nz * fz
            # TANGENTIAL-MOTION gate: the fix exists to stop SLIDING
            # bodies jamming on seams. A resting body keeps the raw
            # normals — switching its support normals mid-rest perturbs
            # the settled equilibrium into a fall-catch limit cycle that
            # blocks sleep (measured: 2 resting leafy hulls chattered at
            # 0.04 m/s forever, -26% steps/s on shapes).
            vdotf = bvx * fx + bvy * fy + bvz * fz
            vt2 = (
                bvx * bvx + bvy * bvy + bvz * bvz - vdotf * vdotf
            )
            sliding = vt2 > 0.05 * 0.05
            use_fix = ~feat_act & (depth > -0.02) & (align > 0.7) & sliding
            nx = jnp.where(use_fix, fx, nx)
            ny = jnp.where(use_fix, fy, ny)
            nz = jnp.where(use_fix, fz, nz)

            # chunk top-K by repeated max+mask, inserted into the running set.
            # Ties take the first (lowest-index) lane — argmax semantics of
            # the XLA fallback; averaging tied rows would yield a non-unit
            # normal (ADVICE r1).
            from c_game_engine_tpu.ops.capsule_resolve import _first_row

            work = depth
            for _k in range(K):
                m = jnp.max(work, axis=0, keepdims=True)
                is_m = work == m
                first = is_m & (
                    _first_row(is_m) == jax.lax.broadcasted_iota(jnp.int32, is_m.shape, 0)
                )
                pick = lambda a: jnp.sum(jnp.where(first, a, 0.0), 0, keepdims=True)
                cand = [m, pick(nx), pick(ny), pick(nz), pick(qtx), pick(qty), pick(qtz)]
                work = jnp.where(first, -1e30, work)
                # insertion: bubble cand down the sorted best list
                for slot in range(K):
                    swap = cand[0] > best[slot][0]
                    new_slot = [jnp.where(swap, c, b) for c, b in zip(cand, best[slot])]
                    cand = [jnp.where(swap, b, c) for c, b in zip(cand, best[slot])]
                    best[slot] = new_slot
            return sum(best, [])

        best_flat = jax.lax.fori_loop(0, cnt_ref[0, 0, d], chunk_body, sum(best, []))
        for k_ in range(K):
            for c_ in range(7):
                out_ref[c_, d * K + k_ : d * K + k_ + 1, :] = best_flat[k_ * 7 + c_]
        out_ref[7, d * K : (d + 1) * K, :] = jnp.zeros((K, ccx.shape[1]), jnp.float32)


def body_contacts_pallas(tri16, chunk_bounds, body11, D, margin, verts=None, is_box=None):
    """tri16 [T, 16]; chunk_bounds [T/T_CHUNK, 4]; body11 [16, D, B] comps
    (ccx ccy ccz qx qy qz qw hx hy hz on ...); margin = chunk skip radius,
    scalar or per-body [D] (support diagonal + candidate slack);
    verts [D, V, 3] support clouds rel. to the shape center with is_box a
    static per-body tuple (True rows use the closed-form box support).
    Returns [8, D*K, B]: depth nx ny nz px py pz pad."""
    import functools

    from c_game_engine_tpu.ops.chunk_compact import block_minmax, compact_chunk_lists

    B = body11.shape[2]
    assert B % BLK == 0
    T = tri16.shape[0]
    NC = chunk_bounds.shape[0]
    if verts is None:
        verts = jnp.zeros((D, 1, 3), jnp.float32)
    if is_box is None:
        is_box = (True,) * D
    V = verts.shape[1]
    verts3 = verts.reshape(1, D, V * 3)

    # per-(block, body) compacted chunk lists; lanes with on==0 (inactive or
    # padded dyn slots) are excluded from the AABB so fully-off bodies cost
    # zero chunk visits
    on = body11[10] > 0.5  # [D, B]
    xmin, xmax = block_minmax(body11[0], BLK, mask=on)  # [D, G]
    zmin, zmax = block_minmax(body11[2], BLK, mask=on)
    idx, cnt = compact_chunk_lists(
        chunk_bounds, xmin, xmax, zmin, zmax, margin
    )  # [D, G, NC], [D, G]
    idx = idx.transpose(1, 0, 2)  # [G, D, NC]
    cnt = cnt.T[:, None, :]  # [G, 1, D] (SMEM windows: last two dims full)

    out = pl.pallas_call(
        functools.partial(_kernel, D=D, is_box=tuple(is_box), V=V),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((T, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, NC), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, D, BLK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, V * 3), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, D * K, BLK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, D * K, B), jnp.float32),
    )(tri16, idx, cnt, body11, verts3)
    return out
