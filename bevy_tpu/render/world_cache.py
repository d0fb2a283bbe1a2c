"""Hash-grid world irradiance cache (reference twin: bevy_solari's world
cache — `bevy_solari/src/realtime/world_cache_query.wesl` hash/probe/
claim, `world_cache_update.wesl` per-cell DI-RIS + GI-bounce + adaptive
temporal blend, `world_cache_compact.wesl` life decay + active-cell
compaction).

TPU form: the cache is a fixed-capacity pytree of arrays living in the
frame state (pure functional — every pass returns a new cache). The
reference's three compute dispatches map to three jitted passes:

- **query** (vectorized over any (..., 3) query points): positions
  quantize at a camera-distance LOD cell size (stochastic LOD rounding,
  same fract^3 rule), normals quantize to their dominant octant; key =
  pcg-hash chain, checksum = iqint-hash chain; a 3-step linear probe is
  3 gathers + a first-match select. Hits return cached irradiance and
  refresh the cell's life (scatter-max); misses claim the empty slot
  (scatter, deterministic winner) and return 0 — exactly the reference's
  atomicCompareExchange protocol, relaxed to batched scatter semantics
  (a same-frame double-claim resolves to one winner, the loser re-probes
  next frame).
- **update**: a soft-targeted budget of live cells re-samples per frame:
  direct light via RIS over K uniform light candidates + one shadow ray
  (`sample_random_light_ris`), plus one cosine GI bounce whose hit
  QUERIES THE CACHE — multi-bounce light propagates one cache hop per
  frame, the reference's trick. New samples blend with the adaptive
  luminance-delta alpha of `blend_new_samples`.
- **decay**: life decrements; dead cells clear checksum + radiance.

Radiance convention: cells store diffuse IRRADIANCE-like energy E
(incident radiance x cos, albedo NOT applied) — consumers shade
`albedo/pi * E`; the GI update adds `albedo_hit * E_hit` (the cosine
pdf cancels, matching the reference's `base_color * radiance`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LIFETIME = 10          # frames a cell lives unqueried (WORLD_CACHE_CELL_LIFETIME)
PROBE_STEPS = 3        # linear probe length (WORLD_CACHE_MAX_SEARCH_STEPS)


def make_world_cache(capacity=16384):
    """capacity must be a power of two (the key wrap is a mask)."""
    assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
    return {
        "checksum": jnp.zeros(capacity, jnp.uint32),   # 0 = empty
        "life": jnp.zeros(capacity, jnp.int32),
        "radiance": jnp.zeros((capacity, 3), jnp.float32),
        "samples": jnp.zeros(capacity, jnp.float32),
        "lum_delta": jnp.zeros(capacity, jnp.float32),
        "pos": jnp.zeros((capacity, 3), jnp.float32),
        "normal": jnp.zeros((capacity, 3), jnp.float32),
    }


def _pcg(x):
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) \
        * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _iqint(x):
    n = (x << jnp.uint32(13)) ^ x
    return n * (n * n * jnp.uint32(15731) + jnp.uint32(789221)) + \
        jnp.uint32(1376312589)


def _hash01(x):
    x = x.astype(jnp.uint32)
    for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
        x = (x ^ (x >> 16)) * jnp.uint32(c)
    return (x >> jnp.uint32(8)).astype(jnp.float32) / float(1 << 24)


def cell_size(pos, view_pos, u, *, base=0.25, lod_scale=50.0):
    """Camera-distance LOD cell size with stochastic rounding (ref:
    get_cell_size — fract^3 dither keeps LOD seams unstructured)."""
    d = jnp.linalg.norm(pos - view_pos, axis=-1) / lod_scale
    lod_f = jnp.log2(1.0 + d)
    fr = lod_f - jnp.floor(lod_f)
    lod = jnp.floor(lod_f) + (u < fr * fr * fr)
    return base * jnp.exp2(lod)


def _keys(pos, normal, size):
    qp = jnp.floor(pos / size[..., None] + 1e-4).astype(jnp.int32) \
        .astype(jnp.uint32)
    qn = jnp.floor(normal + 1e-4).astype(jnp.int32).astype(jnp.uint32)
    key = _pcg(qp[..., 0])
    key = _pcg(key + qp[..., 1])
    key = _pcg(key + qp[..., 2])
    key = _pcg(key + qn[..., 0])
    key = _pcg(key + qn[..., 1])
    key = _pcg(key + qn[..., 2])
    cs = _iqint(qp[..., 0])
    cs = _iqint(cs + qp[..., 1])
    cs = _iqint(cs + qp[..., 2])
    cs = _iqint(cs + qn[..., 0])
    cs = _iqint(cs + qn[..., 1])
    cs = _iqint(cs + qn[..., 2])
    return key, jnp.maximum(cs, jnp.uint32(1))   # 0 reserved for empty


def cache_query(cache, pos, normal, view_pos, rng_u, *, base=0.25,
                lod_scale=50.0, active=None, claim=True):
    """Vectorized query (ref: query_world_cache). pos/normal (..., 3);
    rng_u (...,) uniform [0,1) for the LOD dither. Returns
    (new_cache, radiance (..., 3), hit (...,)) — `hit` True when the
    cell existed with history; misses claim their slot (geometry stored)
    so the update pass feeds them, and every touched cell's life
    refreshes to LIFETIME."""
    cap = cache["checksum"].shape[0]
    mask = jnp.uint32(cap - 1)
    if active is None:
        active = jnp.ones(pos.shape[:-1], bool)
    size = cell_size(pos, view_pos, rng_u, base=base, lod_scale=lod_scale)
    key, want = _keys(pos, normal, size)

    # 3-step linear probe: gather the 3 candidate slots, pick the first
    # matching-or-empty (the reference's CAS loop, batched)
    kflat = [(key + jnp.uint32(i)) & mask for i in range(PROBE_STEPS)]
    css = [cache["checksum"][k.astype(jnp.int32)] for k in kflat]
    match = [c == want for c in css]
    empty = [c == jnp.uint32(0) for c in css]
    usable = [m | e for m, e in zip(match, empty)]
    # first usable slot index (PROBE_STEPS when none)
    sel = jnp.full(pos.shape[:-1], PROBE_STEPS, jnp.int32)
    for i in range(PROBE_STEPS - 1, -1, -1):
        sel = jnp.where(usable[i], i, sel)
    found = sel < PROBE_STEPS
    ksel = kflat[0]
    for i in range(1, PROBE_STEPS):
        ksel = jnp.where(sel == i, kflat[i], ksel)
    ksel_i = ksel.astype(jnp.int32)
    was_match = jnp.zeros(pos.shape[:-1], bool)
    for i in range(PROBE_STEPS):
        was_match = was_match | ((sel == i) & match[i])
    hit = active & found & was_match
    claim_new = active & found & ~was_match           # empty slot
    rad = jnp.where(hit[..., None], cache["radiance"][ksel_i], 0.0)

    out = dict(cache)
    touch = active & found
    kt = jnp.where(touch, ksel_i, cap)                # drop-mode sentinel
    kt1 = kt.reshape(-1)
    # life refresh: scatter-max LIFETIME (ref: atomicMax on life)
    out["life"] = cache["life"].at[kt1].max(LIFETIME, mode="drop")
    if claim:
        kc = jnp.where(claim_new, ksel_i, cap).reshape(-1)
        out["checksum"] = out["checksum"].at[kc].set(
            want.reshape(-1), mode="drop")
        out["pos"] = out["pos"].at[kc].set(pos.reshape(-1, 3), mode="drop")
        out["normal"] = out["normal"].at[kc].set(
            normal.reshape(-1, 3), mode="drop")
    return out, rad, hit


def cache_decay(cache):
    """ref: decay_world_cache — life -1; dead cells clear fully."""
    life = jnp.maximum(cache["life"] - 1, 0)
    dead = life == 0
    return {
        "checksum": jnp.where(dead, jnp.uint32(0), cache["checksum"]),
        "life": life,
        "radiance": jnp.where(dead[:, None], 0.0, cache["radiance"]),
        "samples": jnp.where(dead, 0.0, cache["samples"]),
        "lum_delta": jnp.where(dead, 0.0, cache["lum_delta"]),
        "pos": cache["pos"],
        "normal": cache["normal"],
    }


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def cache_update(cache, frame, lights, soup=None, *, budget=2048,
                 di_samples=4, view_pos=None, base=0.25, lod_scale=50.0,
                 max_temporal=16.0, gi_ray=True, shadow_chunk=4096):
    """Per-frame cell update (ref: world_cache_update.wesl sample_di +
    sample_gi + blend_new_samples). A compacted prefix of up to `budget`
    live cells re-samples:

    - DI: RIS over `di_samples` uniform light candidates (target = lum
      of incident radiance x cos), one shadow ray to the winner when a
      triangle soup is given (ref: sample_random_light_ris).
    - GI: one cosine-hemisphere bounce; the hit point queries THE CACHE
      (one light hop per frame => multi-bounce across frames) and
      contributes albedo_hit * E_hit.
    - blend: adaptive alpha from the cell's luminance delta.

    lights: dict with pos (L,3), col (L,3) (premultiplied intensity),
    rng (L,), mask (L,). soup: bake_triangle_soup dict or None.
    Returns the new cache."""
    cap = cache["checksum"].shape[0]
    live = cache["life"] > 0
    n_live = jnp.sum(live.astype(jnp.int32))
    posc = jnp.cumsum(live.astype(jnp.int32)) - 1
    tgt = jnp.where(live & (posc < budget), posc, budget)
    ids = jnp.zeros(budget + 1, jnp.int32).at[tgt].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")[:budget]
    sel_ok = jnp.arange(budget, dtype=jnp.int32) < n_live
    cpos = cache["pos"][ids]
    cnrm = cache["normal"][ids]

    lane = jnp.arange(budget, dtype=jnp.uint32)
    fr = jnp.asarray(frame, jnp.uint32)

    lpos, lcol, lrng, lmask = (lights["pos"], lights["col"],
                               lights["rng"], lights["mask"])
    nl = lpos.shape[0]
    alive_idx = jnp.where(lmask, jnp.arange(nl, dtype=jnp.int32), nl)
    compact = jnp.arange(nl, dtype=jnp.int32)[jnp.argsort(alive_idx)]
    n_alive = jnp.sum(lmask.astype(jnp.int32))
    l_f = jnp.maximum(n_alive, 1).astype(jnp.float32)

    # --- DI via RIS (uniform candidate pdf 1/L) ---
    wsum = jnp.zeros(budget, jnp.float32)
    sel_rad = jnp.zeros((budget, 3), jnp.float32)
    sel_ph = jnp.zeros(budget, jnp.float32)
    sel_lpos = jnp.zeros((budget, 3), jnp.float32)
    for s in range(di_samples):
        u = _hash01(lane * jnp.uint32(di_samples * 2) + jnp.uint32(2 * s)
                    + fr * jnp.uint32(0x68E31DA4))
        draw = jnp.minimum((u * jnp.maximum(n_alive, 1)).astype(jnp.int32),
                           jnp.maximum(n_alive - 1, 0))
        li = compact[draw]
        d = lpos[li] - cpos
        d2 = jnp.sum(d * d, -1)
        ldir = d * jax.lax.rsqrt(jnp.maximum(d2, 1e-9))[..., None]
        rng2 = jnp.maximum(lrng[li] ** 2, 1e-9)
        win = jnp.clip(1.0 - (d2 / rng2) ** 2, 0.0, 1.0)
        atten = win * win / (d2 + 1.0)
        nol = jnp.maximum(jnp.sum(cnrm * ldir, -1), 0.0)
        contrib = lcol[li] * (atten * nol * lmask[li])[..., None]
        ph = _lum(contrib)
        w = (ph * l_f) / di_samples          # mis 1/S * phat / (1/L)
        wsum = wsum + w
        u2 = _hash01(lane * jnp.uint32(di_samples * 2) +
                     jnp.uint32(2 * s + 1) + fr * jnp.uint32(0xB5297A4D))
        take = (u2 * wsum < w) & (w > 0)
        sel_rad = jnp.where(take[:, None], contrib, sel_rad)
        sel_ph = jnp.where(take, ph, sel_ph)
        sel_lpos = jnp.where(take[:, None], lpos[li], sel_lpos)
    w_ucw = jnp.where(sel_ph > 0, wsum / jnp.maximum(sel_ph, 1e-9), 0.0)
    if soup is not None:
        from bevy_tpu.render.pathtracer import intersect_chunk
        d = sel_lpos - cpos
        dist = jnp.linalg.norm(d, axis=-1)
        dirs = d / jnp.maximum(dist, 1e-9)[..., None]
        orig = cpos + cnrm * 1e-2
        pad = (-budget) % shadow_chunk
        nch = (budget + pad) // shadow_chunk

        def seg(args):
            o, dd = args
            return intersect_chunk(o, dd, soup["v0"], soup["e1"],
                                   soup["e2"])
        t_hit, _tri = jax.lax.map(seg, (
            jnp.pad(orig, ((0, pad), (0, 0))).reshape(nch, shadow_chunk, 3),
            jnp.pad(dirs, ((0, pad), (0, 0))).reshape(nch, shadow_chunk, 3)))
        t_hit = t_hit.reshape(-1)[:budget]
        vis = (t_hit >= dist - 1e-2).astype(jnp.float32)
        w_ucw = w_ucw * vis
    new_e = sel_rad * w_ucw[:, None]

    # --- GI: one cosine bounce; hit queries the cache (multi-bounce) ---
    cache2 = cache
    if gi_ray and soup is not None:
        from bevy_tpu.render.pathtracer import intersect_chunk
        u1 = _hash01(lane + fr * jnp.uint32(0x1B56C4E9))
        u2 = _hash01(lane + fr * jnp.uint32(0x85EBCA6B) + jnp.uint32(7))
        r = jnp.sqrt(u1)
        phi = 2.0 * jnp.pi * u2
        s_ = jnp.where(cnrm[:, 2] >= 0.0, 1.0, -1.0)
        a_ = -1.0 / (s_ + cnrm[:, 2])
        b_ = cnrm[:, 0] * cnrm[:, 1] * a_
        t1 = jnp.stack([1.0 + s_ * cnrm[:, 0] ** 2 * a_, s_ * b_,
                        -s_ * cnrm[:, 0]], -1)
        t2 = jnp.stack([b_, s_ + cnrm[:, 1] ** 2 * a_, -cnrm[:, 1]], -1)
        lz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        bdir = (t1 * (r * jnp.cos(phi))[:, None] +
                t2 * (r * jnp.sin(phi))[:, None] + cnrm * lz[:, None])
        orig = cpos + cnrm * 1e-2
        pad = (-budget) % shadow_chunk
        nch = (budget + pad) // shadow_chunk

        def seg2(args):
            o, dd = args
            return intersect_chunk(o, dd, soup["v0"], soup["e1"],
                                   soup["e2"])
        t_hit, tri = jax.lax.map(seg2, (
            jnp.pad(orig, ((0, pad), (0, 0))).reshape(nch, shadow_chunk, 3),
            jnp.pad(bdir, ((0, pad), (0, 0))).reshape(nch, shadow_chunk, 3)))
        t_hit = t_hit.reshape(-1)[:budget]
        tri = tri.reshape(-1)[:budget]
        ghit = sel_ok & (t_hit < 3.3e38)
        hp = cpos + bdir * jnp.where(ghit, t_hit, 0.0)[:, None]
        hn = soup["n"][tri]
        hn = hn * jnp.where(jnp.sum(hn * bdir, -1) > 0,
                            -1.0, 1.0)[:, None]
        u3 = _hash01(lane + fr * jnp.uint32(0xC2B2AE35) + jnp.uint32(13))
        vp = view_pos if view_pos is not None else jnp.zeros(3)
        cache2, e_hit, _ = cache_query(
            cache, hp, hn, vp, u3, base=base, lod_scale=lod_scale,
            active=ghit)
        new_e = new_e + soup["alb"][tri] * e_hit * ghit[:, None] + \
            soup["emi"][tri] * jnp.pi * ghit[:, None]

    # --- adaptive temporal blend (ref: blend_new_samples) ---
    old_e = cache["radiance"][ids]
    old_s = cache["samples"][ids]
    old_d = cache["lum_delta"][ids]
    s_cnt = jnp.minimum(old_s + 1.0, max_temporal)
    alpha_r = jnp.abs(old_d) / jnp.maximum(_lum(old_e), 1e-3)
    max_s = max_temporal + (1.0 - max_temporal) * \
        jnp.clip(alpha_r, 0.0, 1.0) ** 0.125
    blend = 1.0 / jnp.minimum(s_cnt, max_s)
    blended = old_e + (new_e - old_e) * blend[:, None]
    new_d = old_d + (_lum(blended) - _lum(old_e) - old_d) * 0.125

    kw = jnp.where(sel_ok, ids, cap)
    out = dict(cache2)
    out["radiance"] = cache2["radiance"].at[kw].set(blended, mode="drop")
    out["samples"] = cache2["samples"].at[kw].set(s_cnt, mode="drop")
    out["lum_delta"] = cache2["lum_delta"].at[kw].set(new_d, mode="drop")
    return out
