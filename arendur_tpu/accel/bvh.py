"""BVH: host-side SAH build + wavefront device traversal.

Build mirrors the reference's recursive SAH builder flattened to a
LinearNode array (ref: src/component/bvh.rs): 32 centroid buckets on
the max-extent axis, prefix/suffix area accumulation, leaf fallback at
<= max_leaf primitives, depth-first layout with first child at i+1 and
the second-child offset stored per interior node (bvh.rs:137-146,
219-243, 377-415).

Traversal is the SoA wavefront version of the reference's explicit
stack walk (bvh.rs:97-128): every ray carries its own node cursor and
fixed-depth stack in device arrays; a `lax.while_loop` steps all rays
until every lane's stack is empty.  Near-child-first ordering uses the
ray direction sign on the stored split axis; the cached slab test uses
precomputed inverse directions (ref: bbox.rs:549-592).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

N_BUCKETS = 32
TRAVERSAL_COST = 0.125
STACK_DEPTH = 48


@struct.dataclass
class BVH:
    bmin: jnp.ndarray    # [M,3]
    bmax: jnp.ndarray    # [M,3]
    second: jnp.ndarray  # [M] int32: interior -> index of second child
    start: jnp.ndarray   # [M] int32: leaf -> offset into order
    count: jnp.ndarray   # [M] int32: leaf -> #prims (0 for interior)
    axis: jnp.ndarray    # [M] int32 split axis
    order: jnp.ndarray   # [T] int32 primitive permutation

    @property
    def n_nodes(self):
        return self.bmin.shape[0]


def build_bvh(v0, v1, v2, max_leaf: int = 4, native: bool = True) -> BVH:
    """Binned-SAH build on the host.

    Prefers the native C++ builder (arendur_tpu/native — the reference's
    builder is likewise native, bvh.rs:246-316); falls back to the
    bit-identical NumPy implementation below.
    """
    if native:
        from arendur_tpu import native as nat
        out = nat.build_bvh_native(v0, v1, v2, max_leaf)
        if out is not None:
            return BVH(**out)
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = len(v0)
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    centroid = 0.5 * (pmin + pmax)

    order = np.arange(t, dtype=np.int32)
    nodes = []  # dicts; 'second' patched after recursion

    def leaf_node(lo, hi):
        nodes.append(dict(
            bmin=pmin[order[lo:hi]].min(0), bmax=pmax[order[lo:hi]].max(0),
            second=0, start=lo, count=hi - lo, axis=0))

    def surface_area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def recurse(lo, hi):
        idx = order[lo:hi]
        node_id = len(nodes)
        bmin = pmin[idx].min(0)
        bmax = pmax[idx].max(0)
        n = hi - lo
        if n <= max_leaf:
            leaf_node(lo, hi)
            return node_id
        cmin = centroid[idx].min(0)
        cmax = centroid[idx].max(0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] < 1e-12:
            # identical centroids: arbitrary even split keeps leaves
            # within max_leaf
            mid = (lo + hi) // 2
            nodes.append(dict(bmin=bmin, bmax=bmax, second=0, start=0,
                              count=0, axis=axis))
            recurse(lo, mid)
            second_id = recurse(mid, hi)
            nodes[node_id]["second"] = second_id
            return node_id
        # SAH buckets (ref: bvh.rs:377-415)
        scale = N_BUCKETS / extent[axis]
        b = np.minimum(
            ((centroid[idx, axis] - cmin[axis]) * scale).astype(np.int64),
            N_BUCKETS - 1)
        counts = np.bincount(b, minlength=N_BUCKETS)
        bucket_min = np.full((N_BUCKETS, 3), np.inf, np.float32)
        bucket_max = np.full((N_BUCKETS, 3), -np.inf, np.float32)
        for k in range(N_BUCKETS):
            sel = b == k
            if sel.any():
                bucket_min[k] = pmin[idx[sel]].min(0)
                bucket_max[k] = pmax[idx[sel]].max(0)
        # prefix/suffix accumulation
        costs = np.full(N_BUCKETS - 1, np.inf, np.float32)
        left_min = np.minimum.accumulate(bucket_min, 0)
        left_max = np.maximum.accumulate(bucket_max, 0)
        right_min = np.minimum.accumulate(bucket_min[::-1], 0)[::-1]
        right_max = np.maximum.accumulate(bucket_max[::-1], 0)[::-1]
        left_count = np.cumsum(counts)
        right_count = np.cumsum(counts[::-1])[::-1]
        total_area = max(surface_area(bmin, bmax), 1e-20)
        for k in range(N_BUCKETS - 1):
            if left_count[k] == 0 or right_count[k + 1] == 0:
                continue
            costs[k] = TRAVERSAL_COST + (
                left_count[k] * surface_area(left_min[k], left_max[k])
                + right_count[k + 1]
                * surface_area(right_min[k + 1], right_max[k + 1])
            ) / total_area
        best = int(np.argmin(costs))
        if not np.isfinite(costs[best]):
            # all prims fell into one bucket: even split
            mid = (lo + hi) // 2
            nodes.append(dict(bmin=bmin, bmax=bmax, second=0, start=0,
                              count=0, axis=axis))
            recurse(lo, mid)
            second_id = recurse(mid, hi)
            nodes[node_id]["second"] = second_id
            return node_id
        sel_left = b <= best
        left_ids = idx[sel_left]
        right_ids = idx[~sel_left]
        order[lo:lo + len(left_ids)] = left_ids
        order[lo + len(left_ids):hi] = right_ids
        mid = lo + len(left_ids)
        nodes.append(dict(bmin=bmin, bmax=bmax, second=0, start=0,
                          count=0, axis=axis))
        recurse(lo, mid)
        second_id = recurse(mid, hi)
        nodes[node_id]["second"] = second_id
        return node_id

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        if t > 0:
            recurse(0, t)
        else:
            nodes.append(dict(bmin=np.zeros(3, np.float32),
                              bmax=np.zeros(3, np.float32), second=0,
                              start=0, count=0, axis=0))
    finally:
        sys.setrecursionlimit(old_limit)

    return BVH(
        bmin=np.stack([n["bmin"] for n in nodes]),
        bmax=np.stack([n["bmax"] for n in nodes]),
        second=np.asarray([n["second"] for n in nodes], np.int32),
        start=np.asarray([n["start"] for n in nodes], np.int32),
        count=np.asarray([n["count"] for n in nodes], np.int32),
        axis=np.asarray([n["axis"] for n in nodes], np.int32),
        order=order)


def _slab_test(bmin, bmax, o, inv_d, tmax):
    """Cached-ray AABB test (ref: bbox.rs:549-592), conservative
    1+2*gamma3 scaling."""
    g3 = 3.0 * 2.0 ** -24 / (1.0 - 3.0 * 2.0 ** -24)
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1) * (1.0 + 2.0 * g3)
    tn = jnp.max(tnear, axis=-1)
    tf = jnp.min(tfar, axis=-1)
    return (tn <= tf) & (tf > 0.0) & (tn < tmax)


def intersect_bvh(bvh: BVH, v0, v1, v2, o, d, tmax, max_leaf: int = 4):
    """Closest hit via per-ray stack traversal.

    v0/v1/v2 are the *original-order* triangle arrays; bvh.order maps
    leaf ranges to primitive ids.  Returns (t, tri_idx, b0, b1) like
    intersect_scene_tris.
    """
    from arendur_tpu.geometry.vec import as_jax
    from arendur_tpu.shapes import triangle as tri
    bvh = as_jax(bvh)
    v0, v1, v2 = jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d < 0, -1e-20, 1e-20), d)
    # the leaf test shares the oracle's exact watertight shear test
    # (triangle._watertight_core) so accepts are identical (SURVEY M2)
    perm, shear = tri.ray_shear(d)

    v0o = v0[bvh.order]
    v1o = v1[bvh.order]
    v2o = v2[bvh.order]

    tie = o[:, 0] * 0.0
    state = dict(
        node=jnp.zeros((n,), jnp.int32) + tie.astype(jnp.int32),
        sp=jnp.zeros((n,), jnp.int32) + tie.astype(jnp.int32),
        stack=jnp.zeros((n, STACK_DEPTH), jnp.int32)
        + tie.astype(jnp.int32)[:, None],
        done=(o[:, 0] != o[:, 0]),
        best_t=tmax + tie,
        best_i=jnp.full((n,), -1, jnp.int32) + tie.astype(jnp.int32),
        best_b0=tie,
        best_b1=tie,
    )

    def cond(s):
        return ~jnp.all(s["done"])

    def body(s):
        node = s["node"]
        bmin = bvh.bmin[node]
        bmax = bvh.bmax[node]
        second = bvh.second[node]
        start = bvh.start[node]
        count = bvh.count[node]
        axis = bvh.axis[node]

        active = ~s["done"]
        box_hit = _slab_test(bmin, bmax, o, inv_d, s["best_t"]) & active
        is_leaf = count > 0

        # --- leaf: test up to max_leaf primitives ---
        best_t = s["best_t"]
        best_i = s["best_i"]
        best_b0 = s["best_b0"]
        best_b1 = s["best_b1"]
        for k in range(max_leaf):
            pid = jnp.clip(start + k, 0, v0o.shape[0] - 1)
            take = box_hit & is_leaf & (k < count)
            hit, t, b0, b1 = tri.intersect_watertight_lanewise(
                o, d, best_t, perm, shear, v0o[pid], v1o[pid], v2o[pid])
            upd = take & hit & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_i = jnp.where(upd, bvh.order[pid], best_i)
            best_b0 = jnp.where(upd, b0, best_b0)
            best_b1 = jnp.where(upd, b1, best_b1)

        # --- interior: near child first, push far child ---
        dir_neg = jnp.take_along_axis(d, axis[:, None], 1)[:, 0] < 0.0
        near = jnp.where(dir_neg, second, node + 1)
        far = jnp.where(dir_neg, node + 1, second)
        descend = box_hit & ~is_leaf

        sp = s["sp"]
        stack = s["stack"]
        can_push = descend & (sp < STACK_DEPTH)
        stack = stack.at[jnp.arange(n), jnp.clip(sp, 0, STACK_DEPTH - 1)] \
            .set(jnp.where(can_push, far, stack[jnp.arange(n),
                                               jnp.clip(sp, 0, STACK_DEPTH - 1)]))
        sp = jnp.where(can_push, sp + 1, sp)

        # next node: descend -> near; otherwise pop
        pop_needed = active & ~descend
        can_pop = pop_needed & (sp > 0)
        sp_after = jnp.where(can_pop, sp - 1, sp)
        popped = stack[jnp.arange(n), jnp.clip(sp_after, 0, STACK_DEPTH - 1)]
        next_node = jnp.where(descend, near,
                              jnp.where(can_pop, popped, node))
        done = s["done"] | (pop_needed & (sp == 0))

        return dict(node=next_node, sp=sp_after, stack=stack, done=done,
                    best_t=best_t, best_i=best_i, best_b0=best_b0,
                    best_b1=best_b1)

    out = jax.lax.while_loop(cond, body, state)
    return out["best_t"], out["best_i"], out["best_b0"], out["best_b1"]
