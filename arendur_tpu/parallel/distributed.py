"""Multi-host distributed rendering over DCN (SURVEY.md §2.13/§5.8).

The reference is a single-process renderer (rayon threads over film
tiles, renderer/pt.rs:163-167).  The TPU-native scale-out story has
two layers:

* intra-host: shard_map over the device mesh (parallel/mesh.py) —
  collectives ride ICI;
* inter-host: ``jax.distributed.initialize`` forms the global runtime
  (coordination service over TCP/DCN); every process holds a replica
  of the scene, rays are sharded over the GLOBAL device list, and the
  same ``psum`` that merges per-device films now also crosses hosts.

``init_distributed`` must run before any JAX backend is touched.  On
CPU the cross-process collectives use the gloo transport — this is
how the 2-process test (tests/test_distributed.py) proves the DCN
film/grad reduction path without TPU pods: the collectives emitted by
shard_map are the same; only the transport differs.

Run a quick self-test (2 processes on one machine):

    python -m arendur_tpu.parallel.distributed --selftest
"""

from __future__ import annotations

import argparse
import os
import sys


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int, local_device_count: int = None,
                     platform: str = None):
    """Initialize the multi-process JAX runtime.  MUST be called
    before the first jax.devices()/jit.

    coordinator_address: "host:port" of process 0.
    local_device_count: CPU only — number of virtual devices to expose
    per process (TPU processes expose their physical chips).
    Returns the jax module (import side effect ordering matters)."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu" or (platform is None
                             and os.environ.get("JAX_PLATFORMS") == "cpu"):
        # cross-process CPU collectives ride the gloo TCP transport
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if local_device_count:
            jax.config.update("jax_num_cpu_devices", local_device_count)
        os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax


def global_ray_mesh():
    """1-D 'rays' mesh over ALL devices of the cluster (every host's
    chips), the multi-host analogue of parallel/mesh.make_ray_mesh."""
    import jax
    import numpy as np
    from arendur_tpu.parallel import mesh as pmesh
    return pmesh.make_ray_mesh(np.array(jax.devices()))


def render_multihost(scene, camera, film_cfg, config):
    """Full render sharded over the global mesh.  Every process calls
    this with an identical scene/config; rays are sharded over all
    devices, the film is psum-reduced (ICI within a host, DCN across
    hosts), and the finalized [H, W, 3] image (identical on every
    process) is returned as a NumPy array."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from arendur_tpu.filming import film as flm
    from arendur_tpu.parallel import mesh as pmesh

    mesh = global_ray_mesh()
    w, h = film_cfg.resolution
    spp = config.spp
    total = w * h * spp
    nd = mesh.devices.size
    wave = min(config.wave_size, total)
    wave = ((wave + nd - 1) // nd) * nd
    run = pmesh.sharded_render_fn(scene, camera, film_cfg, config, mesh)
    sharding = NamedSharding(mesh, P(pmesh.AXIS))

    state = None
    n_waves = (total + wave - 1) // wave
    for i in range(n_waves):
        base = i * wave
        idx = jax.make_array_from_callback(
            (wave,), sharding,
            lambda sl: np.arange(base, base + wave,
                                 dtype=np.int32)[sl[0]])
        part = run(idx)
        state = part if state is None else flm.FilmState(
            rgb=state.rgb + part.rgb, weight=state.weight + part.weight)
    img = flm.film_finalize(
        flm.FilmState(rgb=jnp.asarray(state.rgb.addressable_data(0)),
                      weight=jnp.asarray(state.weight.addressable_data(0))),
        film_cfg)
    return np.asarray(img)


# ---------------------------------------------------------------------------
# self-test worker (used by tests/test_distributed.py)
# ---------------------------------------------------------------------------

def _tiny_setup():
    import numpy as np
    from arendur_tpu import scene as sc
    from arendur_tpu import materials as mats
    from arendur_tpu.filming import camera as cam
    from arendur_tpu.filming import film as flm
    from arendur_tpu.sampling import filters as filt
    from arendur_tpu.render import integrator as integ
    from arendur_tpu.geometry import transform as tf
    b = sc.SceneBuilder()
    m = b.add_material(mtype=mats.M_MATTE, kd=(0.6, 0.5, 0.4), sigma=0.0)
    v = np.array([[-10, -10, 0], [10, -10, 0], [10, 10, 0],
                  [-10, 10, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    b.add_mesh(v, f, m)
    b.add_point_light((0, 0, 2.0), (10.0, 10.0, 10.0))
    scene = b.build()
    pv = np.asarray(tf.look_at([0, 0, 1.0], [0, 0, 0.0], [0, 1, 0.0]))
    camera = cam.make_perspective(
        parent_view=pv, screen_min=(-1, -1), screen_max=(1, 1),
        znear=0.1, zfar=100.0, fov=1.0, lens=None, resolution=(8, 8))
    film_cfg = flm.FilmConfig(
        resolution=(8, 8), filter=filt.FilterSpec("box", (0.5, 0.5)))
    config = integ.RenderConfig(max_depth=2, spp=8, sample_dx=4,
                                sample_dy=2, wave_size=8 * 8 * 8)
    return scene, camera, film_cfg, config


def selftest(num_processes: int = 2, local_devices: int = 2,
             coordinator: str = "localhost:12421"):
    """Spawn the 2-process CPU self-test (tools/mh_worker.py workers —
    the worker lives outside the package because the CPU device-count
    and gloo configs must be set before any JAX backend exists, and
    importing arendur_tpu touches JAX)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tools/mh_worker.py"),
             "--coordinator", coordinator,
             "--num-processes", str(num_processes),
             "--process-id", str(pid),
             "--local-devices", str(local_devices),
             "--out", f"/tmp/arendur_mh_{pid}.npy"]))
    rcs = [p.wait(timeout=600) for p in procs]
    print("selftest rcs:", rcs)
    return max(rcs)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--selftest", action="store_true")
    ap.parse_args()
    sys.exit(selftest())
