"""Tiled diffusion sampling (4K+ outputs) — TPU redesign.

Behavioral contract: `TiledRestoreEDMSampler` (sampling.py:600-660): at every
sigma step, each sliding-window latent tile is denoised with its own slice
of the control latent (and optionally its own prompt), then tiles are
blended back with Gaussian weights.

The reference loops tiles sequentially in Python inside each step. Here:
  - tile coords are static -> gather/scatter become fixed index ops,
  - all tiles are denoised as ONE batched network call per step (tile axis
    folded into batch: CFG 2x and tiles T give a 2T*B batch — exactly what
    the MXU wants), or sharded over the mesh 'tile' axis via shard_map,
  - the Gaussian blend is a scatter-add; the weight-sum normalizer is
    precomputed once (it is step-independent),
  - the whole sampler is still a single lax.scan over steps.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from supir_tpu.diffusion.samplers import StepTables
from supir_tpu.utils.tiling import gaussian_weights, sliding_windows


def make_tile_plan(h: int, w: int, tile_size: int, tile_stride: int):
    coords = sliding_windows(h, w, tile_size, tile_stride)
    weights = gaussian_weights(tile_size, tile_size)
    starts = np.asarray([(hi, wi) for (hi, _he, wi, _we) in coords], np.int32)
    # step-independent blend normalizer
    count = np.zeros((h, w), np.float32)
    for (hi, he, wi, we) in coords:
        count[hi:he, wi:we] += weights
    return starts, weights, count


def _gather_tiles(x, starts, ts):
    """x [B,H,W,C] -> [T,B,ts,ts,C] with static starts."""
    return jnp.stack(
        [jax.lax.dynamic_slice(x, (0, int(hi), int(wi), 0),
                               (x.shape[0], ts, ts, x.shape[3]))
         for hi, wi in starts],
        axis=0,
    )


def _scatter_tiles(tiles, starts, shape, weights):
    """[T,B,ts,ts,C] weighted scatter-add -> [B,H,W,C]."""
    out = jnp.zeros(shape, tiles.dtype)
    w = weights[None, :, :, None]
    for i, (hi, wi) in enumerate(starts):
        patch = jax.lax.dynamic_slice(
            out, (0, int(hi), int(wi), 0),
            (shape[0], tiles.shape[2], tiles.shape[3], shape[3]),
        )
        out = jax.lax.dynamic_update_slice(
            out, patch + tiles[i] * w, (0, int(hi), int(wi), 0)
        )
    return out


def tiled_restore_edm_sample(
    denoise_tile: Callable,
    x: jnp.ndarray,
    rng: jax.Array,
    tables: StepTables,
    x_center: jnp.ndarray,
    control_tiles: jnp.ndarray,
    tile_size: int,
    tile_stride: int,
    s_noise: float = 1.003,
    mesh: Optional[Mesh] = None,
    crossattn_tiles: Optional[jnp.ndarray] = None,
    step_offset=0,
):
    """RestoreEDM over sliding-window tiles.

    denoise_tile(x_tiles [T,B,ts,ts,C], sigma[B], cfg[B], ctrl_scale,
                 control_tiles [T,B,ts,ts,C], crossattn_tiles or None)
        -> denoised tiles [T,B,ts,ts,C]
    control_tiles: LQ latent sliced per tile (computed once by the caller).
    crossattn_tiles: optional per-tile text conditioning [T, ...] for the
    local-prompt mode of the tiled demo.
    step_offset: global index of this call's first step. Per-step keys are
    fold_in(rng, global_step), so running the schedule in segments
    (`steps_per_call`) is bit-identical to one program — the reference runs
    one loop with one noise stream (sampling.py:572-597) and our
    segmentation must not change outputs for a fixed seed.
    """
    b, h, w, c = x.shape
    starts, weights, count = make_tile_plan(h, w, tile_size, tile_stride)
    ts = tile_size
    n = tables.num_steps
    step_idx = jnp.arange(n, dtype=jnp.int32) + jnp.asarray(step_offset, jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(step_idx)
    count_j = jnp.asarray(count)[None, :, :, None]
    weights_j = jnp.asarray(weights)

    x_center_tiles = _gather_tiles(x_center, starts, ts)

    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.sigma_hat),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.churn_std),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        jnp.asarray(tables.restore_weight),
        keys,
    )

    def step(x, scan_in):
        sigma, sigma_hat, next_sigma, churn_std, cfg_s, ctrl_s, rw, key = scan_in
        eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
        x_churned = x + eps * churn_std

        x_tiles = _gather_tiles(x_churned, starts, ts)
        sig_b = jnp.full((b,), sigma_hat)
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise_tile(
            x_tiles, sig_b, cfg_b, ctrl_s, control_tiles, crossattn_tiles
        )
        denoised = denoised - (denoised - x_center_tiles) * rw
        d = (x_tiles - denoised) / sigma_hat
        stepped = x_tiles + d * (next_sigma - sigma_hat)

        blended = _scatter_tiles(stepped, starts, x.shape, weights_j) / count_j
        return blended, None

    x, _ = jax.lax.scan(step, x, xs)
    return x


def tiled_restore_edm_sample_cached(
    denoise_tile_cached: Callable,
    cache0,
    recompute: jnp.ndarray,
    x: jnp.ndarray,
    rng: jax.Array,
    tables: StepTables,
    x_center: jnp.ndarray,
    control_tiles: jnp.ndarray,
    tile_size: int,
    tile_stride: int,
    s_noise: float = 1.003,
    crossattn_tiles: Optional[jnp.ndarray] = None,
    step_offset=0,
    return_cache: bool = False,
):
    """Tiled RestoreEDM with the cross-step feature cache (tile-indexed):
    the UNet encoder/middle + control pyramid of EVERY tile is recomputed
    only on steps where `recompute[i]` is True and reused in between —
    the DeepCache-style speedup of the flat path (engine/supir.py
    _network_cached) extended to the 4K tiled pipeline, whose per-tile
    encoder cost dominates wall clock. recompute uses GLOBAL step
    semantics via `step_offset`, and `return_cache=True` threads the cache
    across `steps_per_call` segments."""
    b, h, w, c = x.shape
    starts, weights, count = make_tile_plan(h, w, tile_size, tile_stride)
    ts = tile_size
    n = tables.num_steps
    step_idx = jnp.arange(n, dtype=jnp.int32) + jnp.asarray(step_offset, jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(step_idx)
    count_j = jnp.asarray(count)[None, :, :, None]
    weights_j = jnp.asarray(weights)

    x_center_tiles = _gather_tiles(x_center, starts, ts)

    xs = (
        jnp.asarray(tables.sigma),
        jnp.asarray(tables.sigma_hat),
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.churn_std),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
        jnp.asarray(tables.restore_weight),
        jnp.asarray(recompute),
        keys,
    )

    def step(carry, scan_in):
        x, cache = carry
        (sigma, sigma_hat, next_sigma, churn_std, cfg_s, ctrl_s, rw, rec,
         key) = scan_in
        eps = jax.random.normal(key, x.shape, x.dtype) * s_noise
        x_churned = x + eps * churn_std

        x_tiles = _gather_tiles(x_churned, starts, ts)
        sig_b = jnp.full((b,), sigma_hat)
        cfg_b = jnp.full((b,), cfg_s)
        denoised, cache = denoise_tile_cached(
            x_tiles, sig_b, cfg_b, ctrl_s, control_tiles, crossattn_tiles,
            cache, rec,
        )
        denoised = denoised - (denoised - x_center_tiles) * rw
        d = (x_tiles - denoised) / sigma_hat
        stepped = x_tiles + d * (next_sigma - sigma_hat)

        blended = _scatter_tiles(stepped, starts, x.shape, weights_j) / count_j
        return (blended, cache), None

    (x, cache), _ = jax.lax.scan(step, (x, cache0), xs)
    if return_cache:
        return x, cache
    return x


def tiled_restore_dpmpp2m_sample(
    denoise_tile: Callable,
    x: jnp.ndarray,
    rng: jax.Array,
    tables: StepTables,
    control_tiles: jnp.ndarray,
    tile_size: int,
    tile_stride: int,
    eta: float = 1.0,
    s_noise: float = 1.003,
    crossattn_tiles: Optional[jnp.ndarray] = None,
    step_offset=0,
    carry_in=None,
    bt_range=None,
    return_carry: bool = False,
):
    """Tiled DPM++(2M) SDE (reference TiledRestoreDPMPP2MSampler,
    sampling.py:663-730): per-step tile denoise + Gaussian blend of BOTH
    the state and the old_denoised carry.

    Segmentation (`steps_per_call`): pass step_offset = global index of
    this call's first step, carry_in = (old_denoised, prev_sigma) from the
    previous segment, bt_range = (GLOBAL sigma_min, sigma_max) so the
    virtual-Brownian-tree noise keys stay segment-invariant, and
    return_carry=True to get (x, carry) back. The SDE noise itself is keyed
    by the (sigma, next_sigma) interval, so segmentation is bit-invariant
    like the EDM sampler's fold_in(rng, global_step) scheme."""
    b, h, w, c = x.shape
    starts, weights, count = make_tile_plan(h, w, tile_size, tile_stride)
    ts = tile_size
    n = tables.num_steps
    count_j = jnp.asarray(count)[None, :, :, None]
    weights_j = jnp.asarray(weights)

    sig = jnp.asarray(tables.sigma)
    if carry_in is None:
        old_denoised0 = jnp.zeros_like(x)
        prev_sigma0 = jnp.ones((), sig.dtype)
    else:
        old_denoised0, prev_sigma0 = carry_in
    prev_sigma = jnp.concatenate([prev_sigma0[None].astype(sig.dtype), sig[:-1]])
    # traced scalars (tables are dynamic jit args)
    if bt_range is None:
        bt_min, bt_max = sig[-1], sig[0]
    else:
        bt_min, bt_max = bt_range
    xs = (
        jnp.asarray(np.arange(n, dtype=np.int32)) + jnp.asarray(step_offset, jnp.int32),
        prev_sigma,
        sig,
        jnp.asarray(tables.next_sigma),
        jnp.asarray(tables.cfg_scale),
        jnp.asarray(tables.control_scale),
    )

    def step(carry, scan_in):
        x, old_denoised = carry
        i, p_sigma, sigma, next_sigma, cfg_s, ctrl_s = scan_in
        x_tiles = _gather_tiles(x, starts, ts)
        old_tiles = _gather_tiles(old_denoised, starts, ts)
        sig_b = jnp.full((b,), sigma)
        cfg_b = jnp.full((b,), cfg_s)
        denoised = denoise_tile(
            x_tiles, sig_b, cfg_b, ctrl_s, control_tiles, crossattn_tiles
        )

        t = -jnp.log(sigma)
        t_next = -jnp.log(jnp.maximum(next_sigma, 1e-20))
        hstep = t_next - t
        eta_h = eta * hstep
        mult1 = (next_sigma / sigma) * jnp.exp(-eta_h)
        mult2 = jnp.expm1(-hstep - eta_h)
        x_standard = mult1 * x_tiles - mult2 * denoised
        h_last = t - (-jnp.log(p_sigma))
        r = h_last / hstep
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_tiles
        x_advanced = mult1 * x_tiles - mult2 * denoised_d
        use_adv = (i > 0) & (next_sigma > 1e-14)
        stepped = jnp.where(use_adv, x_advanced, x_standard)
        if eta > 0:
            from supir_tpu.diffusion.samplers import brownian_increment

            eps = brownian_increment(
                rng, sigma, next_sigma, bt_min, bt_max, x.shape, x.dtype
            )
            eps_tiles = _gather_tiles(eps, starts, ts)
            std = next_sigma * jnp.sqrt(-jnp.expm1(-2.0 * eta_h)) * s_noise
            # reference parity: no noise on step 0 or terminal steps
            # (sampling.py:471-474 early return before injection)
            stepped = jnp.where(
                (i > 0) & (next_sigma > 1e-14), stepped + eps_tiles * std, stepped
            )

        x_new = _scatter_tiles(stepped, starts, x.shape, weights_j) / count_j
        old_new = _scatter_tiles(denoised, starts, x.shape, weights_j) / count_j
        return (x_new, old_new), None

    (x, old_denoised), _ = jax.lax.scan(step, (x, old_denoised0), xs)
    if return_carry:
        return x, (old_denoised, sig[-1])
    return x


def make_tiled_denoise(
    denoise_flat: Callable,
    mesh: Optional[Mesh] = None,
    tile_chunk: Optional[int] = None,
):
    """Lift a per-batch denoiser into a tile-axis denoiser.

    denoise_flat(x [B',h,w,C], sigma [B'], cfg [B'], ctrl_s, control [B',...],
                 crossattn or None) -> [B',h,w,C]

    Without a mesh the tile axis is folded into the batch (one big MXU
    call); with a mesh carrying a 'tile' axis the fold happens per-shard
    under shard_map. `tile_chunk` bounds how many tiles fold into one call
    (single-chip 4K+: 49 tiles x CFG2 at full width would blow HBM — the
    reference runs tiles one-at-a-time, tilevae-style; we run them
    `tile_chunk` at a time under `lax.map`).
    """

    def folded(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles):
        t, b = x_tiles.shape[0], x_tiles.shape[1]
        flat = x_tiles.reshape((t * b,) + x_tiles.shape[2:])
        ctrl = control_tiles.reshape((t * b,) + control_tiles.shape[2:])
        sig = jnp.tile(sigma, t)
        cfg_t = jnp.tile(cfg, t)
        ca = None
        if crossattn_tiles is not None:
            # [T, B, 77, D] -> [T*B, 77, D]
            ca = crossattn_tiles.reshape((t * b,) + crossattn_tiles.shape[2:])
        out = denoise_flat(flat, sig, cfg_t, ctrl_s, ctrl, ca)
        return out.reshape(x_tiles.shape)

    def chunked(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles):
        t = x_tiles.shape[0]
        if t <= tile_chunk:
            return folded(x_tiles, sigma, cfg, ctrl_s, control_tiles,
                          crossattn_tiles)
        pad = (-t) % tile_chunk
        if pad:
            x_tiles = jnp.concatenate([x_tiles, x_tiles[-pad:]], 0)
            control_tiles = jnp.concatenate([control_tiles, control_tiles[-pad:]], 0)
            if crossattn_tiles is not None:
                crossattn_tiles = jnp.concatenate(
                    [crossattn_tiles, crossattn_tiles[-pad:]], 0
                )
        ng = (t + pad) // tile_chunk
        xg = x_tiles.reshape((ng, tile_chunk) + x_tiles.shape[1:])
        cg = control_tiles.reshape((ng, tile_chunk) + control_tiles.shape[1:])
        if crossattn_tiles is None:
            out = jax.lax.map(
                lambda ab: folded(ab[0], sigma, cfg, ctrl_s, ab[1], None),
                (xg, cg),
            )
        else:
            cag = crossattn_tiles.reshape(
                (ng, tile_chunk) + crossattn_tiles.shape[1:]
            )
            out = jax.lax.map(
                lambda ab: folded(ab[0], sigma, cfg, ctrl_s, ab[1], ab[2]),
                (xg, cg, cag),
            )
        out = out.reshape((ng * tile_chunk,) + out.shape[2:])
        return out[:t]

    if mesh is None or "tile" not in getattr(mesh, "shape", {}) or mesh.shape["tile"] <= 1:
        return chunked if tile_chunk else folded

    def sharded(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles):
        t = x_tiles.shape[0]
        nshard = mesh.shape["tile"]
        pad = (-t) % nshard
        if pad:
            x_tiles = jnp.concatenate([x_tiles, x_tiles[-pad:]], 0)
            control_tiles = jnp.concatenate([control_tiles, control_tiles[-pad:]], 0)
            if crossattn_tiles is not None:
                crossattn_tiles = jnp.concatenate(
                    [crossattn_tiles, crossattn_tiles[-pad:]], 0
                )
        sig_a = jnp.asarray(sigma)
        cfg_a = jnp.asarray(cfg)
        ctrl_a = jnp.asarray(ctrl_s, jnp.float32).reshape(())
        if crossattn_tiles is None:
            f = lambda xt, ct, s_, c_, cs_: folded(xt, s_, c_, cs_, ct, None)
            out = shard_map(
                f, mesh=mesh,
                in_specs=(P("tile"), P("tile"), P(), P(), P()),
                out_specs=P("tile"), check_vma=False,
            )(x_tiles, control_tiles, sig_a, cfg_a, ctrl_a)
        else:
            f = lambda xt, ct, ca, s_, c_, cs_: folded(xt, s_, c_, cs_, ct, ca)
            out = shard_map(
                f, mesh=mesh,
                in_specs=(P("tile"), P("tile"), P("tile"), P(), P(), P()),
                out_specs=P("tile"), check_vma=False,
            )(x_tiles, control_tiles, crossattn_tiles, sig_a, cfg_a, ctrl_a)
        return out[:t]

    return sharded


def make_tiled_denoise_cached(
    denoise_flat_cached: Callable,
    mesh: Optional[Mesh] = None,
    tile_chunk: Optional[int] = None,
):
    """Cache-threading variant of `make_tiled_denoise`.

    denoise_flat_cached(x [B',...], sigma [B'], cfg [B'], ctrl_s,
        control [B',...], crossattn or None, cache, recompute)
        -> ([B',...], cache)
    where the cache pytree's leaves are batched over the SAME flat batch
    as x (the engine builds cache0 with the matching layout, see
    SUPIREngine._tiled_feature_cache_zeros):
      - folded:  flat [2*T*B, ...] leaves
      - chunked: chunk-major [ng, 2*chunk*B, ...] leaves (lax.map axis 0)
      - sharded: [nshard * 2*localT*B, ...] leaves split by P('tile')
    """

    def folded(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles,
               cache, rec):
        t, b = x_tiles.shape[0], x_tiles.shape[1]
        flat = x_tiles.reshape((t * b,) + x_tiles.shape[2:])
        ctrl = control_tiles.reshape((t * b,) + control_tiles.shape[2:])
        sig = jnp.tile(sigma, t)
        cfg_t = jnp.tile(cfg, t)
        ca = None
        if crossattn_tiles is not None:
            ca = crossattn_tiles.reshape((t * b,) + crossattn_tiles.shape[2:])
        out, cache = denoise_flat_cached(
            flat, sig, cfg_t, ctrl_s, ctrl, ca, cache, rec
        )
        return out.reshape(x_tiles.shape), cache

    def chunked(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles,
                cache, rec):
        t = x_tiles.shape[0]
        pad = (-t) % tile_chunk
        if pad:
            x_tiles = jnp.concatenate([x_tiles, x_tiles[-pad:]], 0)
            control_tiles = jnp.concatenate([control_tiles, control_tiles[-pad:]], 0)
            if crossattn_tiles is not None:
                crossattn_tiles = jnp.concatenate(
                    [crossattn_tiles, crossattn_tiles[-pad:]], 0
                )
        ng = (t + pad) // tile_chunk
        xg = x_tiles.reshape((ng, tile_chunk) + x_tiles.shape[1:])
        cg = control_tiles.reshape((ng, tile_chunk) + control_tiles.shape[1:])
        cag = None
        if crossattn_tiles is not None:
            cag = crossattn_tiles.reshape(
                (ng, tile_chunk) + crossattn_tiles.shape[1:]
            )

        def body(args):
            if cag is not None:
                xb, cb, cab, cacheb = args
            else:
                xb, cb, cacheb = args
                cab = None
            return folded(xb, sigma, cfg, ctrl_s, cb, cab, cacheb, rec)

        xs = (xg, cg, cag, cache) if cag is not None else (xg, cg, cache)
        out, cache = jax.lax.map(body, xs)
        out = out.reshape((ng * tile_chunk,) + out.shape[2:])
        return out[:t], cache

    if mesh is None or "tile" not in getattr(mesh, "shape", {}) or mesh.shape["tile"] <= 1:
        return chunked if tile_chunk else folded

    def sharded(x_tiles, sigma, cfg, ctrl_s, control_tiles, crossattn_tiles,
                cache, rec):
        t = x_tiles.shape[0]
        nshard = mesh.shape["tile"]
        pad = (-t) % nshard
        if pad:
            x_tiles = jnp.concatenate([x_tiles, x_tiles[-pad:]], 0)
            control_tiles = jnp.concatenate([control_tiles, control_tiles[-pad:]], 0)
            if crossattn_tiles is not None:
                crossattn_tiles = jnp.concatenate(
                    [crossattn_tiles, crossattn_tiles[-pad:]], 0
                )
        sig_a = jnp.asarray(sigma)
        cfg_a = jnp.asarray(cfg)
        ctrl_a = jnp.asarray(ctrl_s, jnp.float32).reshape(())
        rec_a = jnp.asarray(rec).reshape(())
        cache_spec = jax.tree_util.tree_map(lambda _: P("tile"), cache)
        if crossattn_tiles is None:
            f = lambda xt, ct, cch, s_, c_, cs_, r_: folded(
                xt, s_, c_, cs_, ct, None, cch, r_)
            out, cache = shard_map(
                f, mesh=mesh,
                in_specs=(P("tile"), P("tile"), cache_spec, P(), P(), P(), P()),
                out_specs=(P("tile"), cache_spec), check_vma=False,
            )(x_tiles, control_tiles, cache, sig_a, cfg_a, ctrl_a, rec_a)
        else:
            f = lambda xt, ct, ca, cch, s_, c_, cs_, r_: folded(
                xt, s_, c_, cs_, ct, ca, cch, r_)
            out, cache = shard_map(
                f, mesh=mesh,
                in_specs=(P("tile"), P("tile"), P("tile"), cache_spec,
                          P(), P(), P(), P()),
                out_specs=(P("tile"), cache_spec), check_vma=False,
            )(x_tiles, control_tiles, crossattn_tiles, cache, sig_a, cfg_a,
              ctrl_a, rec_a)
        return out[:t], cache

    return sharded
