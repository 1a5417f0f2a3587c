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


def film_init(config: FilmConfig) -> FilmState:
    w, h = config.resolution
    return FilmState(
        rgb=jnp.zeros((h * w, 3), jnp.float32),
        weight=jnp.zeros((h * w,), jnp.float32))


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
    return FilmState(rgb=rgb, weight=weight)


def film_finalize(state: FilmState, config: FilmConfig):
    """sum / weight per pixel, black where weight == 0
    (ref: TilePixel::finalize, film.rs:338-345).  Returns [H, W, 3]."""
    w, h = config.resolution
    safe = jnp.where(state.weight > 0.0, state.weight, 1.0)
    img = jnp.where(
        (state.weight > 0.0)[:, None], state.rgb / safe[:, None], 0.0)
    return img.reshape(h, w, 3)


def to_srgb_u8(img) -> np.ndarray:
    """Clamp to [0,1] and quantize to 8-bit like the reference's
    Image::save (film.rs:380-391 via ToNorm)."""
    arr = np.asarray(jax.device_get(img))
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(img, path: str):
    from PIL import Image
    Image.fromarray(to_srgb_u8(img), mode="RGB").save(path)
