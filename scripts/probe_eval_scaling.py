"""Microbenchmark the stage-3 deform-eval program's scaling axes.

Answers the round-5 design questions for the cross-monument batching:
  * ns per point-candidate of `_batch_deform_visible_iou_penalized` at the
    production shapes (N=16k/32k shell, P=64 chunk, 256x384 plane);
  * does a LARGER candidate chunk (P=128/256) lower ns/pc (i.e. is the
    per-dispatch fixed cost significant)?
  * does a scene-axis vmap (M=2/4/8 monuments in one program) lower ns/pc
    (i.e. is the device underutilized at one monument's program)?
  * where inside the program the time goes (projection vs segment_min vs
    plane terms), via stripped-down jits.

Run from /root/repo:  python scripts/probe_eval_scaling.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from pbr3d.deform.search import (
    _batch_deform_visible_iou_penalized,
)
from pbr3d.ops.cameramath import project_points_soa

Hp, Wp = 256, 384
NB_Q = 8


def synth(rng, N, P, M=None):
    def one(key):
        r = np.random.default_rng(key)
        coords = r.integers(20, 230, size=(N, 3)).astype(np.int16)
        valid = np.ones((N,), bool)
        valid[int(N * 0.8):] = False
        cam = np.array([300, 150, 300, 128, 100, 128, 500.0, 190.0, 128.0],
                       np.float32)
        gt = np.zeros((Hp, Wp), bool)
        gt[40:200, 60:300] = True
        rest = np.full((Hp, Wp), np.inf, np.float32)
        rest[80:180, 100:250] = 400.0
        deforms = np.ones((P, 4), np.float32)
        deforms[:, 0] = r.uniform(0.8, 1.2, P)
        deforms[:, 1] = r.uniform(-20, 20, P)
        deforms[:, 2] = r.uniform(0.8, 1.2, P)
        deforms[:, 3] = r.uniform(-20, 20, P)
        nb = dict(
            nb_zb=r.uniform(300, 500, (NB_Q, Hp // 2, Wp // 2)).astype(np.float32),
            nb_base=r.random((NB_Q, Hp // 2, Wp // 2)) < 0.2,
            nb_gt=r.random((NB_Q, Hp // 2, Wp // 2)) < 0.2,
            nb_floor=np.full((NB_Q,), 0.3, np.float32),
            nb_valid=np.ones((NB_Q,), bool),
        )
        kw = dict(
            deforms=deforms, coords=coords, valid=valid, cam_vec=cam,
            gt_part=gt, rest_zbuf=rest,
            true_hw=np.array([256, 341], np.int32),
            voxel_shape=np.array([256, 256, 256], np.int32),
            center=np.array([128, 100, 128], np.float32), **nb,
        )
        return kw

    if M is None:
        return {k: jnp.asarray(v) for k, v in one(rng).items()}
    rows = [one(rng + i) for i in range(M)]
    return {k: jnp.asarray(np.stack([r[k] for r in rows])) for k in rows[0]}


def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("H", "W", "approx"))
def eval_multi(H, W, approx, **kw):
    f = functools.partial(_batch_deform_visible_iou_penalized,
                          H=H, W=W, approx=approx)
    return jax.vmap(lambda kd: f(**kd))(kw)


@jax.jit
def proj_only(deforms, coords, cam_vec):
    c = coords.astype(jnp.float32)

    def one(d):
        xs = c[:, 0] * d[2] + d[3]
        ys = c[:, 1] * d[0] + d[1]
        zs = c[:, 2] * d[2] + d[3]
        u, v, Z = project_points_soa(
            xs, ys, zs, cam_vec[0:3], cam_vec[3:6], cam_vec[6], cam_vec[7],
            cam_vec[8])
        return u.sum() + v.sum() + Z.sum()

    return jax.vmap(one)(deforms)


@jax.jit
def segmin_only(deforms, coords, cam_vec):
    c = coords.astype(jnp.float32)

    def one(d):
        xs = c[:, 0] * d[2] + d[3]
        ys = c[:, 1] * d[0] + d[1]
        zs = c[:, 2] * d[2] + d[3]
        u, v, Z = project_points_soa(
            xs, ys, zs, cam_vec[0:3], cam_vec[3:6], cam_vec[6], cam_vec[7],
            cam_vec[8])
        pix = (jnp.clip(v.astype(jnp.int32), 0, Hp - 1) * Wp
               + jnp.clip(u.astype(jnp.int32), 0, Wp - 1))
        zb = jax.ops.segment_min(Z.astype(jnp.float32), pix,
                                 num_segments=Hp * Wp + 1)
        return zb[: Hp * Wp].min()

    return jax.vmap(one)(deforms)


def main():
    results = {}
    for N in (16384, 32768):
        for P in (64, 128, 256):
            kw = synth(0, N, P)
            for approx in (True, False):
                t = timeit(_batch_deform_visible_iou_penalized, H=Hp, W=Wp,
                           approx=approx, **kw)
                pc = P * N * (1 if approx else 7)
                key = f"full N={N} P={P} approx={approx}"
                results[key] = (t, t / pc * 1e9)
                print(f"{key}: {t*1e3:.2f} ms  {t/pc*1e9:.2f} ns/pc",
                      flush=True)
        # scene-axis vmap at production chunk
        for M in (2, 4, 8):
            kw = synth(0, N, 64, M=M)
            t = timeit(eval_multi, Hp, Wp, True, **kw)
            pc = M * 64 * N
            key = f"vmapM N={N} M={M} P=64 approx=True"
            results[key] = (t, t / pc * 1e9)
            print(f"{key}: {t*1e3:.2f} ms  {t/pc*1e9:.2f} ns/pc", flush=True)
        # component splits
        kw = synth(0, N, 64)
        t = timeit(proj_only, kw["deforms"], kw["coords"], kw["cam_vec"])
        print(f"proj_only N={N} P=64: {t*1e3:.2f} ms  "
              f"{t/(64*N)*1e9:.2f} ns/pc", flush=True)
        t = timeit(segmin_only, kw["deforms"], kw["coords"], kw["cam_vec"])
        print(f"proj+segmin N={N} P=64: {t*1e3:.2f} ms  "
              f"{t/(64*N)*1e9:.2f} ns/pc", flush=True)


if __name__ == "__main__":
    main()
