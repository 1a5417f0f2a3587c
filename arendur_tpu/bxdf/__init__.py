"""BxDF models and BSDF slot-table mixtures (ref: src/bxdf/,
src/material/bsdf.rs).

The reference dispatches through `Bxdf` trait objects allocated in a
per-tile arena (<=8 per BSDF).  The TPU design replaces that with a
fixed-width *slot table*: each hit owns K slots of typed, uniform
parameter records; evaluation computes every bxdf model's response for
every lane and masks by slot type — branchless, fully vectorized over
the wavefront.
"""

from arendur_tpu.bxdf import types, fresnel, microfacet, slots
