"""Tiled VAE encode/decode, sharded over the 'tile' mesh axis.

TPU redesign of the reference "Ultimate VAE Tile Optimization"
(`SUPIR/utils/tilevae.py:677-971`). The reference decomposes the VAE forward
into a sequential per-tile task queue, suspending every GroupNorm until all
tiles' statistics are pooled on the host. Here:

  - the image is split into UNIFORM halo-padded tiles (pad 32 px encoder /
    8 latent decoder, vs the reference's 32/11) stacked on a leading tile
    axis;
  - the whole encoder/decoder runs batched over that axis (vmap with a
    named axis on one device; shard_map over the mesh 'tile' axis across
    devices);
  - the cross-tile GroupNorm statistic pooling (`GroupNormParam.summary`,
    tilevae.py:629) becomes `lax.pmean` over the named tile axes — a real
    ICI collective on hardware;
  - the seam-free merge (`crop_valid_region`, tilevae.py:556) is a static
    crop + reshape.

No task queue, no host round-trips, no 100 GB of host RAM: everything stays
in HBM and compiles to one XLA program.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from supir_tpu.models.vae import VAEDecoder, VAEEncoder


def split_uniform_tiles(x: jnp.ndarray, tile: int, pad: int):
    """[B, H, W, C] -> tiles [T, B, tile+2p, tile+2p, C] with edge-padded
    halos; returns (tiles, grid=(gh, gw), padded_size=(Hp, Wp))."""
    b, h, w, c = x.shape
    gh, gw = math.ceil(h / tile), math.ceil(w / tile)
    hp, wp = gh * tile, gw * tile
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    tiles = []
    for i in range(gh):
        for j in range(gw):
            tiles.append(x[:, i * tile : i * tile + tile + 2 * pad,
                            j * tile : j * tile + tile + 2 * pad])
    return jnp.stack(tiles, axis=0), (gh, gw), (hp, wp)


def merge_valid_tiles(tiles: jnp.ndarray, grid, out_hw, crop: int):
    """tiles [T, B, th, tw, C] -> [B, H, W, C]: crop `crop` px of halo from
    each side, lay out on the grid, trim edge padding."""
    gh, gw = grid
    t, b, th, tw, c = tiles.shape
    valid = tiles[:, :, crop : th - crop, crop : tw - crop]
    vh, vw = valid.shape[2], valid.shape[3]
    canvas = valid.reshape(gh, gw, b, vh, vw, c)
    canvas = canvas.transpose(2, 0, 3, 1, 4, 5).reshape(b, gh * vh, gw * vw, c)
    return canvas[:, : out_hw[0], : out_hw[1]]


def _pad_tile_axis(tiles: jnp.ndarray, mult: int):
    t = tiles.shape[0]
    padded = (-t) % mult
    if padded:
        tiles = jnp.concatenate([tiles, jnp.repeat(tiles[-1:], padded, axis=0)], 0)
    return tiles, t


def _run_tiles(
    module,
    params,
    tiles,
    mesh: Optional[Mesh],
    chunk: Optional[int] = None,
):
    """Apply `module` (with cross-tile GN axes) over the tile axis.

    - unchunked single chip: vmap with the "tile_local" named axis — GN
      statistics pool over ALL tiles (exact);
    - mesh: shard_map over the 'tile' axis — pmean rides ICI; padded
      duplicate tiles carry zero pmean weight so statistics stay exact
      even when the tile count does not divide the mesh axis;
    - chunked (`chunk` tiles per lax.map step, the single-chip HBM bound
      for 4K+): GN pools within each chunk group only — this is the
      reference's opt-in "fast mode" (tilevae.py:855-876). The DEFAULT
      chunked path does not come through here: tiled_encode/tiled_decode
      route it to the staged-exact executor below, which reproduces the
      reference's exact global pooling (tilevae.py:599-648).
    """
    use_mesh = (
        mesh is not None
        and "tile" in mesh.shape
        and mesh.shape["tile"] > 1
    )

    def local_fn(p, tl, w=None):
        if w is None:
            f = lambda one: module.apply({"params": p}, one)
            return jax.vmap(f, axis_name="tile_local")(tl)
        f = lambda one, wi: module.apply({"params": p}, one, wi)
        return jax.vmap(f, axis_name="tile_local")(tl, w)

    if not use_mesh:
        if chunk is not None and tiles.shape[0] > chunk:
            # fast mode: groups run under lax.map — ONE compile, only one
            # group's activations live (a python loop inside an outer jit
            # would unroll and blow HBM); stats are chunk-local
            tiles_p, t_orig = _pad_tile_axis(tiles, chunk)
            ng = tiles_p.shape[0] // chunk
            grps = tiles_p.reshape((ng, chunk) + tiles_p.shape[1:])
            out = jax.lax.map(lambda g: local_fn(params, g), grps)
            return out.reshape((ng * chunk,) + out.shape[2:])[:t_orig]
        return local_fn(params, tiles)

    tiles, t_orig = _pad_tile_axis(tiles, mesh.shape["tile"])
    # zero pmean weight for padded duplicate tiles (exact stats even when
    # the tile count does not divide the mesh axis)
    t_pad = tiles.shape[0]
    w = jnp.where(jnp.arange(t_pad) < t_orig, t_pad / t_orig, 0.0)
    spec_t = P("tile")
    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), spec_t, spec_t),
        out_specs=spec_t,
        check_vma=False,
    )(params, tiles, w)
    return out[:t_orig]


# --------------------------------------------------------------------------
# Staged-exact chunked execution (single chip, default)
#
# The reference's exact mode runs a per-tile task queue that SUSPENDS at
# every GroupNorm until all tiles' statistics are pooled on the host,
# storing every tile's activation in ~100 GB of host RAM
# (tilevae.py:599-648). The TPU re-expression: execute the network
# stage-synchronously over the whole tile set. A stage is one res/attn
# block; its GN statistics are global reductions either directly over the
# stored all-tiles state (the GN input is the stored state) or via a
# no-store stats pass (GN input is inside the block: recompute conv1 once,
# keep only the [2, B, G] moments). With statistics known, the block
# completes chunk-by-chunk — in place (fori_loop + dynamic_update_slice,
# so XLA keeps ONE all-tiles state buffer) when shapes are preserved.
#
# Cost: conv1 (and any fused up/down-sample) runs twice -> ~1.4x one pass,
# EXACT — vs ~30x for naive per-boundary recompute and vs the reference's
# host-RAM queue (~250 s at 4K; this path measures in the tens of seconds).
# Memory: one all-tiles state at the largest (spatial x channel) point
# (~7 GB at 4K decode in bf16) + one chunk working set. 8K exceeds single
# v5e HBM: use fast_mode or a tile mesh there.
# --------------------------------------------------------------------------


def _flat(g):
    """[chunk, B, ...] -> [chunk*B, ...] (ops are batch-agnostic)."""
    return g.reshape((g.shape[0] * g.shape[1],) + g.shape[2:])


def _unflat(u, chunk):
    return u.reshape((chunk, u.shape[0] // chunk) + u.shape[1:])


def _gn_stats_apply(gp, x, stats, dtype, silu=True, eps=1e-6):
    """GroupNorm with externally supplied global moments. x: [N, h, w, c]
    flattened tile-major (N = chunk*B); stats: [2, B, G]."""
    from supir_tpu.models.layers import GroupNorm32

    n, b, g = x.shape[0], stats.shape[1], stats.shape[2]
    tape = jnp.broadcast_to(stats[:, None], (2, n // b, b, g)).reshape(2, n, g)
    gn = GroupNorm32(eps=eps, fuse_silu=silu, dtype=dtype)
    return gn.apply({"params": gp, "gn_tape": {"tape": tape}}, x)


def _moments_all(y, t_orig, groups=32):
    """Global per-image GN moments of the stored state: [2, B, G]."""
    t, b = y.shape[:2]
    c = y.shape[-1]
    yg = y[:t_orig].reshape(t_orig, b, -1, groups, c // groups)
    m = jnp.mean(yg, axis=(0, 2, 4), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(yg.astype(jnp.float32)), axis=(0, 2, 4))
    return jnp.stack([m, m2])


def _stats_chunks(y, chunk, t_orig, fn_flat, groups=32):
    """Global moments of fn_flat(chunk) WITHOUT storing the activations:
    lax.map over chunk groups keeps only masked per-chunk moment sums."""
    t, b = y.shape[:2]
    ng = t // chunk
    grps = y.reshape((ng, chunk) + y.shape[1:])
    mask = (jnp.arange(t) < t_orig).astype(jnp.float32).reshape(ng, chunk)

    def body(args):
        g, mk = args
        u = _unflat(fn_flat(_flat(g)), chunk)
        ug = u.reshape(chunk, b, -1, groups, u.shape[-1] // groups)
        m = jnp.mean(ug, axis=(2, 4), dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(ug.astype(jnp.float32)), axis=(2, 4))
        w = mk[:, None, None]
        return jnp.sum(m * w, 0), jnp.sum(m2 * w, 0)

    s1, s2 = jax.lax.map(body, (grps, mask))
    n = jnp.float32(t_orig)
    return jnp.stack([jnp.sum(s1, 0) / n, jnp.sum(s2, 0) / n])


def _apply_chunks(y, chunk, fn_flat, inplace):
    """Run fn_flat over chunk groups. inplace (shape-preserving stages):
    fori_loop + dynamic_update_slice so the all-tiles state updates in ONE
    buffer; otherwise lax.map into a fresh output."""
    t, b = y.shape[:2]
    ng = t // chunk

    def run(g):
        return _unflat(fn_flat(_flat(g)), chunk)

    if inplace:
        def body(i, acc):
            g = jax.lax.dynamic_slice_in_dim(acc, i * chunk, chunk, 0)
            return jax.lax.dynamic_update_slice_in_dim(acc, run(g), i * chunk, 0)

        return jax.lax.fori_loop(0, ng, body, y)
    grps = y.reshape((ng, chunk) + y.shape[1:])
    out = jax.lax.map(run, grps)
    return out.reshape((ng * chunk,) + out.shape[2:])


def _staged_resblock(bp, y, t_orig, chunk, out_ch, dtype, pre=None):
    """Exact VAEResnetBlock over all tiles (models/vae.py:31-44 semantics).

    pre: optional per-chunk transform fused in front of the block (the
    up/downsample between levels) — recomputed in the stats passes so its
    full-resolution output is never stored for all tiles at once."""
    from supir_tpu.models.layers import Conv

    conv = lambda p, u, k, **kw: Conv(out_ch, k, dtype=dtype, **kw).apply({"params": p}, u)
    xin = (lambda gf: gf) if pre is None else pre

    st1 = _moments_all(y, t_orig) if pre is None else _stats_chunks(y, chunk, t_orig, xin)

    def u_of(xf):
        return conv(bp["conv1"], _gn_stats_apply(bp["norm1"], xf, st1, dtype), 3)

    st2 = _stats_chunks(y, chunk, t_orig, lambda gf: u_of(xin(gf)))

    def complete(gf):
        x = xin(gf)
        h = conv(bp["conv2"], _gn_stats_apply(bp["norm2"], u_of(x), st2, dtype), 3)
        if x.shape[-1] != out_ch:
            x = Conv(out_ch, 1, dtype=dtype).apply({"params": bp["nin_shortcut"]}, x)
        return x + h

    shape_same = pre is None and y.shape[-1] == out_ch
    return _apply_chunks(y, chunk, complete, inplace=shape_same)


def _staged_attnblock(bp, y, t_orig, chunk, dtype):
    """Exact VAEAttnBlock (models/vae.py:47-62): attention is tile-local,
    only the GN statistics couple tiles."""
    from supir_tpu.models.layers import Conv
    from supir_tpu.ops import dot_product_attention

    c = y.shape[-1]
    st = _moments_all(y, t_orig)
    conv = lambda p, u: Conv(c, 1, dtype=dtype).apply({"params": p}, u)

    def complete(xf):
        n, h, w, _ = xf.shape
        hid = _gn_stats_apply(bp["norm"], xf, st, dtype, silu=False)
        q = conv(bp["q"], hid).reshape(n, h * w, 1, c)
        k = conv(bp["k"], hid).reshape(n, h * w, 1, c)
        v = conv(bp["v"], hid).reshape(n, h * w, 1, c)
        out = dot_product_attention(q, k, v).reshape(n, h, w, c)
        return xf + conv(bp["proj_out"], out)

    return _apply_chunks(y, chunk, complete, inplace=True)


def _staged_encode_exact(cfg, params, tiles, chunk, dtype):
    """VAEEncoder (models/vae.py:65-94) with exact global GN statistics,
    chunked. Mirrors the module structure stage by stage; parameter tree
    identical to the monolithic module."""
    from supir_tpu.models.layers import Conv

    tiles_p, t_orig = _pad_tile_axis(tiles, chunk)
    y = _apply_chunks(
        tiles_p, chunk,
        lambda xf: Conv(cfg.ch, 3, dtype=dtype).apply(
            {"params": params["conv_in"]}, xf.astype(dtype)),
        inplace=False,
    )
    ch = cfg.ch
    pre = None
    for level, mult in enumerate(cfg.ch_mult):
        ch = cfg.ch * mult
        for i in range(cfg.num_res_blocks):
            y = _staged_resblock(
                params[f"down_{level}_block_{i}"], y, t_orig, chunk, ch,
                dtype, pre=pre)
            pre = None
        if level != len(cfg.ch_mult) - 1:
            dp = params[f"down_{level}_downsample"]

            def mk_pre(dp=dp, ch=ch):
                def pre_fn(xf):
                    h = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    return Conv(ch, 3, stride=2, padding=[(0, 0), (0, 0)],
                                dtype=dtype).apply({"params": dp}, h)
                return pre_fn

            pre = mk_pre()
    y = _staged_resblock(params["mid_block_1"], y, t_orig, chunk, ch, dtype, pre=pre)
    y = _staged_attnblock(params["mid_attn_1"], y, t_orig, chunk, dtype)
    y = _staged_resblock(params["mid_block_2"], y, t_orig, chunk, ch, dtype)
    st = _moments_all(y, t_orig)
    out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    y = _apply_chunks(
        y, chunk,
        lambda xf: Conv(out_ch, 3, dtype=dtype).apply(
            {"params": params["conv_out"]},
            _gn_stats_apply(params["norm_out"], xf, st, dtype)),
        inplace=False,
    )
    return y[:t_orig]


def _staged_decode_exact(cfg, params, tiles, chunk, dtype):
    """VAEDecoder (models/vae.py:97-125) with exact global GN statistics,
    chunked; upsamples fuse into the following block's stats/completion
    passes so the (2x spatial, pre-narrowing channels) state is never
    stored for all tiles."""
    from supir_tpu.models.layers import Conv

    tiles_p, t_orig = _pad_tile_axis(tiles, chunk)
    ch = cfg.ch * cfg.ch_mult[-1]
    y = _apply_chunks(
        tiles_p, chunk,
        lambda zf: Conv(ch, 3, dtype=dtype).apply(
            {"params": params["conv_in"]}, zf.astype(dtype)),
        inplace=False,
    )
    y = _staged_resblock(params["mid_block_1"], y, t_orig, chunk, ch, dtype)
    y = _staged_attnblock(params["mid_attn_1"], y, t_orig, chunk, dtype)
    y = _staged_resblock(params["mid_block_2"], y, t_orig, chunk, ch, dtype)
    pre = None
    for rlevel, mult in enumerate(reversed(cfg.ch_mult)):
        level = len(cfg.ch_mult) - 1 - rlevel
        ch = cfg.ch * mult
        for i in range(cfg.num_res_blocks + 1):
            y = _staged_resblock(
                params[f"up_{level}_block_{i}"], y, t_orig, chunk, ch,
                dtype, pre=pre)
            pre = None
        if level != 0:
            up = params[f"up_{level}_upsample"]

            def mk_pre(up=up, ch=ch):
                def pre_fn(xf):
                    n, hh, ww, cc = xf.shape
                    h = xf[:, :, None, :, None, :]
                    h = jnp.broadcast_to(h, (n, hh, 2, ww, 2, cc))
                    h = h.reshape(n, 2 * hh, 2 * ww, cc)
                    return Conv(ch, 3, dtype=dtype).apply({"params": up}, h)
                return pre_fn

            pre = mk_pre()
    st = _moments_all(y, t_orig)
    y = _apply_chunks(
        y, chunk,
        lambda xf: Conv(cfg.out_channels, 3, dtype=dtype).apply(
            {"params": params["conv_out"]},
            _gn_stats_apply(params["norm_out"], xf, st, dtype)),
        inplace=False,
    )
    return y[:t_orig]


def tiled_encode(
    vae_cfg,
    params_encoder,
    params_quant,
    x: jnp.ndarray,
    tile_size: int = 512,
    pad: int = 32,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    chunk: Optional[int] = None,
    fast_mode: bool = False,
):
    """Tiled VAE encode -> moments [B, H/f, W/f, 2z].

    tile_size/pad in image pixels; both must be multiples of the VAE
    downscale factor f. `chunk` bounds per-step memory on one chip; the
    chunked default is the staged-exact executor (global GN statistics,
    the reference's default contract); `fast_mode=True` opts into
    chunk-local statistics (the reference's fast mode).
    """
    f = vae_cfg.downscale_factor
    assert tile_size % f == 0 and pad % f == 0
    b, h, w, _ = x.shape
    axes = ("tile_local", "tile") if (mesh and "tile" in getattr(mesh, "shape", {})) else ("tile_local",)
    enc = VAEEncoder(vae_cfg, norm_axis=axes, dtype=dtype)
    tiles, grid, (hp, wp) = split_uniform_tiles(x, tile_size, pad)
    use_mesh = mesh is not None and "tile" in getattr(mesh, "shape", {}) and mesh.shape["tile"] > 1
    if (not use_mesh) and chunk is not None and tiles.shape[0] > chunk and not fast_mode:
        z_tiles = _staged_encode_exact(vae_cfg, params_encoder, tiles, chunk, dtype)
    else:
        z_tiles = _run_tiles(enc, params_encoder, tiles, mesh, chunk)
    moments = merge_valid_tiles(z_tiles, grid, (hp // f, wp // f), pad // f)
    moments = moments[:, : h // f, : w // f]
    # 1x1 quant conv commutes with tiling; apply on the merged map
    from supir_tpu.models.layers import Conv

    quant = Conv(2 * vae_cfg.embed_dim, 1, dtype=dtype)
    return quant.apply({"params": params_quant}, moments)


def tiled_decode(
    vae_cfg,
    params_decoder,
    params_post_quant,
    z: jnp.ndarray,
    tile_size: int = 64,
    pad: int = 8,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    chunk: Optional[int] = None,
    fast_mode: bool = False,
):
    """Tiled VAE decode -> image [B, H*f, W*f, 3]. tile_size/pad in latent
    px. Chunked default = staged-exact GN statistics; fast_mode opts into
    chunk-local (see tiled_encode)."""
    f = vae_cfg.downscale_factor
    b, h, w, _ = z.shape
    from supir_tpu.models.layers import Conv

    post = Conv(vae_cfg.z_channels, 1, dtype=dtype)
    z = post.apply({"params": params_post_quant}, z)

    axes = ("tile_local", "tile") if (mesh and "tile" in getattr(mesh, "shape", {})) else ("tile_local",)
    dec = VAEDecoder(vae_cfg, norm_axis=axes, dtype=dtype)
    tiles, grid, (hp, wp) = split_uniform_tiles(z, tile_size, pad)
    use_mesh = mesh is not None and "tile" in getattr(mesh, "shape", {}) and mesh.shape["tile"] > 1
    if (not use_mesh) and chunk is not None and tiles.shape[0] > chunk and not fast_mode:
        img_tiles = _staged_decode_exact(vae_cfg, params_decoder, tiles, chunk, dtype)
    else:
        img_tiles = _run_tiles(dec, params_decoder, tiles, mesh, chunk)
    img = merge_valid_tiles(img_tiles, grid, (hp * f, wp * f), pad * f)
    return img[:, : h * f, : w * f]
