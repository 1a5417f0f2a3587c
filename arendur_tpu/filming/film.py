"""Film: filtered sample splatting + finalize (ref: src/filming/film.rs).

The reference splats each sample into every pixel under the filter
support, per tile, then merges tiles.  The TPU-native design keeps a
single film as two flat HBM accumulators (rgb_sum [H*W, 3],
weight_sum [H*W]) and performs the splat as a static (2rx x 2ry)-tap
scatter-add — differentiable, and reducible across devices with a
psum.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from arendur_tpu.sampling import filters as filt


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    resolution: Tuple[int, int]           # (width, height)
    filter: filt.FilterSpec = filt.DEFAULT_FILTER
    crop_min: Tuple[int, int] = (0, 0)    # pixel coords
    crop_max: Tuple[int, int] = (-1, -1)  # -1 = resolution

    def crop(self):
        cmax = (self.crop_max[0] if self.crop_max[0] >= 0 else self.resolution[0],
                self.crop_max[1] if self.crop_max[1] >= 0 else self.resolution[1])
        return self.crop_min, cmax


@struct.dataclass
class FilmState:
    rgb: jnp.ndarray     # [H*W, 3] sum of filter-weighted radiance
    weight: jnp.ndarray  # [H*W] sum of filter weights
    # [H*W, 3] additive splat plane for light-tracing (t=1) strategies:
    # unlike camera samples these are *density* estimates over the film
    # and must not enter the weighted average — they are summed and
    # scaled by 1/spp at finalize (the reference accumulates them on
    # separate full-frame tiles, film.rs:138-168).  None when unused.
    splat: jnp.ndarray = None
    # True when rgb/weight carry film_pad() rows of halo on both ends
    # (flat layout) for the scatter-free pixel-major splat path.
    padded: bool = struct.field(pytree_node=False, default=False)


def film_pad(config: FilmConfig) -> int:
    """Tap halo (pixels per side) of the dense splat: a sample in pixel
    (x, y) only reaches tap pixels within floor(r + 0.5) of it."""
    (rx, ry), _ = filt.make_filter(config.filter)
    return int(math.ceil(max(rx, ry) - 0.5))


def _pad_flat(config: FilmConfig) -> int:
    w, _ = config.resolution
    p = film_pad(config)
    return p * w + p


def film_init(config: FilmConfig, with_splat: bool = False,
              padded: bool = False) -> FilmState:
    w, h = config.resolution
    n = h * w + (2 * _pad_flat(config) if padded else 0)
    return FilmState(
        rgb=jnp.zeros((n, 3), jnp.float32),
        weight=jnp.zeros((n,), jnp.float32),
        splat=(jnp.zeros((h * w, 3), jnp.float32) if with_splat else None),
        padded=padded)


def film_splat(config: FilmConfig, state: FilmState, pfilm, radiance,
               mask=None) -> FilmState:
    """Splat N samples (pfilm [N,2] raster coords, radiance [N,3]).

    Static tap grid of ceil(2rx) x ceil(2ry) pixels around each sample
    (ref: FilmTile::add_sample, film.rs:297-319); offsets are evaluated
    against pixel centers (pidx + 0.5, film.rs:22-28).
    """
    w, h = config.resolution
    (cx0, cy0), (cx1, cy1) = config.crop()
    (rx, ry), evaluate = filt.make_filter(config.filter)
    ntx = max(1, int(math.ceil(2.0 * rx)))
    nty = max(1, int(math.ceil(2.0 * ry)))

    px = pfilm[:, 0]
    py = pfilm[:, 1]
    x0 = jnp.floor(px - rx + 0.5).astype(jnp.int32)
    y0 = jnp.floor(py - ry + 0.5).astype(jnp.int32)

    dxs = jnp.arange(ntx, dtype=jnp.int32)
    dys = jnp.arange(nty, dtype=jnp.int32)
    # tap pixel coords: [N, ntx], [N, nty]
    tx = x0[:, None] + dxs[None, :]
    ty = y0[:, None] + dys[None, :]
    # offsets from pixel centers: [N, ntx]/[N, nty]
    ox = (tx.astype(jnp.float32) + 0.5) - px[:, None]
    oy = (ty.astype(jnp.float32) + 0.5) - py[:, None]

    # full tap grid [N, ntx, nty]
    off = jnp.stack([
        jnp.broadcast_to(ox[:, :, None], ox.shape + (nty,)),
        jnp.broadcast_to(oy[:, None, :], oy.shape[:1] + (ntx, nty))],
        axis=-1)
    wgt = evaluate(off)

    inside = ((jnp.abs(off[..., 0]) <= rx) & (jnp.abs(off[..., 1]) <= ry)
              & (tx[:, :, None] >= cx0) & (tx[:, :, None] < cx1)
              & (ty[:, None, :] >= cy0) & (ty[:, None, :] < cy1))
    if mask is not None:
        inside = inside & mask[:, None, None]
    wgt = jnp.where(inside, wgt, 0.0)

    flat_idx = (jnp.clip(ty[:, None, :], 0, h - 1) * w
                + jnp.clip(tx[:, :, None], 0, w - 1)).reshape(-1)
    wflat = wgt.reshape(-1)
    contrib = (wgt[..., None] * radiance[:, None, None, :]).reshape(-1, 3)

    rgb = state.rgb.at[flat_idx].add(contrib)
    weight = state.weight.at[flat_idx].add(wflat)
    return FilmState(rgb=rgb, weight=weight, splat=state.splat)


def film_splat_pixmajor(config: FilmConfig, state: FilmState, jitter,
                        radiance, pix0, spp: int,
                        mask=None) -> FilmState:
    """Scatter-free splat for pixel-major waves.

    Precondition: the N samples are the spp samples of N/spp
    *consecutive* pixels starting at flat pixel index pix0 (traced
    scalar), sample-minor: sample i belongs to pixel pix0 + i//spp.
    jitter [N,2] is the sub-pixel offset in [0,1)^2 (pfilm - pixel).
    state must be film_init(..., padded=True).

    Instead of a scatter-add over (2r)^2 tap indices per sample (the
    reference's FilmTile::add_sample, film.rs:297-319 — serialized on
    TPU), the filter is evaluated separably per axis and each of the
    (2p+1)^2 static tap offsets becomes one shifted dense add in flat
    film-index space (tap offset (dy,dx) == flat offset dy*W+dx); the
    halo rows absorb off-image taps.  Bit-for-bit the same
    accumulation as film_splat up to float summation order.
    """
    assert state.padded, "film_splat_pixmajor needs film_init(padded=True)"
    w, h = config.resolution
    (cx0, cy0), (cx1, cy1) = config.crop()
    (rx, ry), eval_x, eval_y = filt.make_filter_1d(config.filter)
    p = film_pad(config)
    padf = _pad_flat(config)
    nt = 2 * p + 1
    n = jitter.shape[0]
    n_pix = n // spp
    assert n_pix * spp == n

    jx = jitter[:, 0]
    jy = jitter[:, 1]
    # sample's own pixel coords (for column-wrap / crop masking)
    pix_j = pix0 + jnp.arange(n_pix, dtype=jnp.int32)
    sx = pix_j % w     # [n_pix]
    sy = pix_j // w

    doff = jnp.arange(nt, dtype=jnp.int32) - p          # [nt]
    # per-axis offsets from tap pixel centers: tap center (x+d+0.5)
    # minus sample pos (x+jx)
    ox = (doff[None, :].astype(jnp.float32) + 0.5) - jx[:, None]  # [N,nt]
    oy = (doff[None, :].astype(jnp.float32) + 0.5) - jy[:, None]
    wx = jnp.where(jnp.abs(ox) <= rx, eval_x(ox), 0.0)
    wy = jnp.where(jnp.abs(oy) <= ry, eval_y(oy), 0.0)
    # column validity (x taps must not wrap across rows) + crop window
    tap_x = sx[:, None] + doff[None, :]                  # [n_pix,nt]
    tap_y = sy[:, None] + doff[None, :]
    okx = (tap_x >= cx0) & (tap_x < jnp.minimum(cx1, w))
    oky = (tap_y >= cy0) & (tap_y < cy1)
    wx = wx * okx.repeat(spp, axis=0)
    wy = wy * oky.repeat(spp, axis=0)
    if mask is not None:
        wx = jnp.where(mask[:, None], wx, 0.0)

    lw = jnp.concatenate(
        [radiance, jnp.ones((n, 1), jnp.float32)], -1)   # [N,4]
    # per-pixel per-tap sums over spp:
    # plane[j, dy, dx, c] = sum_s wy[j,s,dy] * wx[j,s,dx] * lw[j,s,c]
    wxs = wx.reshape(n_pix, spp, nt)
    wys = wy.reshape(n_pix, spp, nt)
    lws = lw.reshape(n_pix, spp, 4)
    plane = jnp.einsum("jsd,jse,jsc->jdec", wys, wxs, lws,
                       precision=jax.lax.Precision.HIGHEST)

    # shift-add the nt x nt planes into a local flat window; local[k]
    # corresponds to padded-state flat index pix0 + k
    local = jnp.zeros((n_pix + 2 * padf, 4), jnp.float32)
    for dy in range(nt):
        for dx in range(nt):
            off = (dy - p) * w + (dx - p) + padf
            local = local.at[off:off + n_pix].add(plane[:, dy, dx, :])

    start = pix0.astype(jnp.int32) if hasattr(pix0, "astype") \
        else jnp.int32(pix0)
    win = jax.lax.dynamic_slice(state.rgb, (start, 0),
                                (n_pix + 2 * padf, 3))
    rgb = jax.lax.dynamic_update_slice(
        state.rgb, win + local[:, :3], (start, 0))
    wwin = jax.lax.dynamic_slice(state.weight, (start,),
                                 (n_pix + 2 * padf,))
    weight = jax.lax.dynamic_update_slice(
        state.weight, wwin + local[:, 3], (start,))
    return FilmState(rgb=rgb, weight=weight, splat=state.splat,
                     padded=True)


def film_add_splat(config: FilmConfig, state: FilmState, praster,
                   radiance, mask=None) -> FilmState:
    """Add N light-tracing splats (praster [N,2], radiance [N,3]) to
    the additive splat plane (nearest pixel, crop-clipped).  These are
    measurement-equation densities: they are summed, not averaged —
    normalization is splat_scale (=1/spp) at finalize."""
    w, h = config.resolution
    (cx0, cy0), (cx1, cy1) = config.crop()
    ix = jnp.floor(praster[:, 0]).astype(jnp.int32)
    iy = jnp.floor(praster[:, 1]).astype(jnp.int32)
    inside = (ix >= cx0) & (ix < cx1) & (iy >= cy0) & (iy < cy1)
    if mask is not None:
        inside = inside & mask
    flat_idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    contrib = jnp.where(inside[:, None], radiance, 0.0)
    splat = state.splat
    if splat is None:
        splat = jnp.zeros((h * w, 3), jnp.float32)
    return FilmState(rgb=state.rgb, weight=state.weight,
                     splat=splat.at[flat_idx].add(contrib))


def film_finalize(state: FilmState, config: FilmConfig,
                  splat_scale: float = 0.0):
    """sum / weight per pixel, black where weight == 0
    (ref: TilePixel::finalize, film.rs:338-345), plus
    splat_scale * splat plane.  Returns [H, W, 3]."""
    w, h = config.resolution
    rgb_sum, wgt_sum = state.rgb, state.weight
    if state.padded:
        padf = _pad_flat(config)
        rgb_sum = rgb_sum[padf:padf + h * w]
        wgt_sum = wgt_sum[padf:padf + h * w]
    safe = jnp.where(wgt_sum > 0.0, wgt_sum, 1.0)
    img = jnp.where(
        (wgt_sum > 0.0)[:, None], rgb_sum / safe[:, None], 0.0)
    if state.splat is not None and splat_scale != 0.0:
        img = img + splat_scale * state.splat
    return img.reshape(h, w, 3)


def to_srgb_u8(img) -> np.ndarray:
    """Clamp to [0,1] and quantize to 8-bit like the reference's
    Image::save (film.rs:380-391 via ToNorm)."""
    arr = np.asarray(jax.device_get(img))
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(img, path: str):
    from PIL import Image
    Image.fromarray(to_srgb_u8(img), mode="RGB").save(path)
