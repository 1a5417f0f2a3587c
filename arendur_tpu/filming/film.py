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


def film_init(config: FilmConfig, with_splat: bool = False) -> FilmState:
    w, h = config.resolution
    return FilmState(
        rgb=jnp.zeros((h * w, 3), jnp.float32),
        weight=jnp.zeros((h * w,), jnp.float32),
        splat=(jnp.zeros((h * w, 3), jnp.float32) if with_splat else None))


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
    safe = jnp.where(state.weight > 0.0, state.weight, 1.0)
    img = jnp.where(
        (state.weight > 0.0)[:, None], state.rgb / safe[:, None], 0.0)
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
