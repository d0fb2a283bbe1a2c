"""Post-processing (reference twins: bevy_core_pipeline/tonemapping,
bevy_post_process — bloom, depth of field `src/dof/`, motion blur
`src/motion_blur/`, chromatic aberration (effect stack); bevy_pbr/ssao;
bevy_anti_alias — FXAA `src/fxaa/`, TAA `src/taa/`, CAS sharpening
`src/contrast_adaptive_sharpening/`).

All effects are (C, H, W) XLA image passes in POST_SET — screen-space
compute is exactly the shape the VPU wants, and XLA fuses the chains.
Depth-consuming effects reconstruct view-space position from the
reverse-z buffer (the low mantissa bits carry visbuffer ids — noise
< 2^-19, far below any gradient tolerance). TAA and motion blur consume
per-object motion vectors when the mesh pass provides them
(Mesh3dPlugin(motion_vectors=True) — the motion-vector-prepass twin,
bevy_core_pipeline/src/prepass/mod.rs), falling back to camera-matrix
reprojection elsewhere. Default tonemapping is None (pass-through) so images
stay bit-stable; Reinhard and the ACES fitted curve are the analytic
modes (the reference's default TonyMcMapface needs its LUT asset —
approximated by ACES here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.plugin import POST_SET, RenderTarget


class Tonemapping:
    NONE = 0
    REINHARD = 1
    REINHARD_LUMINANCE = 2
    ACES = 3
    LUT = 4            # 3D LUT (ref: TonyMcMapface/AgX/Blender-Filmic —
                       # all LUT-based modes of bevy tonemapping_luts)


def _luminance(rgb):
    return (0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2])


def neutral_lut(n=33, shoulder=4.0):
    """Procedural neutral filmic 3D LUT (n,n,n,3): the LUT grid is
    indexed by PQ-ish encoded linear rgb in [0, shoulder] and stores a
    Reinhard-luminance + mild crosstalk response. Stand-in for the
    shipped TonyMcMapface .ktx2 (load a real LUT with lut=np.load(...)
    of shape (n,n,n,3) to reproduce it exactly)."""
    import numpy as _np
    ax = _np.linspace(0.0, 1.0, n, dtype=_np.float32)
    r, g, b = _np.meshgrid(ax, ax, ax, indexing="ij")
    rgb = _np.stack([r, g, b], -1) ** 2 * shoulder       # decode
    l = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] +
         0.0722 * rgb[..., 2])
    scale = (1.0 / (1.0 + l))[..., None]
    out = rgb * scale
    # gentle crosstalk desaturates near white (the filmic look)
    m = out.mean(-1, keepdims=True)
    t = _np.clip(l / shoulder, 0.0, 1.0)[..., None] ** 2
    return (out * (1 - 0.3 * t) + m * (0.3 * t)).astype(_np.float32)


def sample_lut3d(rgb, lut, shoulder=4.0):
    """Trilinear 3D-LUT lookup. rgb (3, H, W) linear; lut (n,n,n,3).
    Grid coords use the sqrt shaper matching neutral_lut's decode."""
    n = lut.shape[0]
    lutj = jnp.asarray(lut)
    co = jnp.sqrt(jnp.clip(rgb / shoulder, 0.0, 1.0)) * (n - 1)
    i0 = jnp.clip(jnp.floor(co).astype(jnp.int32), 0, n - 2)
    f = co - i0
    out = 0.0
    for dr in (0, 1):
        for dg in (0, 1):
            for db in (0, 1):
                w = (jnp.abs(1 - dr - f[0]) * jnp.abs(1 - dg - f[1]) *
                     jnp.abs(1 - db - f[2]))
                tex = lutj[i0[0] + dr, i0[1] + dg, i0[2] + db]
                out = out + w[..., None] * tex
    return jnp.moveaxis(out, -1, 0)


def tonemap(rgb, mode: int, exposure: float, lut=None):
    """rgb: (3, H, W) linear planes."""
    rgb = rgb * exposure
    if mode == Tonemapping.NONE:
        return rgb
    if mode == Tonemapping.REINHARD:
        return rgb / (1.0 + rgb)
    if mode == Tonemapping.REINHARD_LUMINANCE:
        l = _luminance(rgb)
        return rgb * (1.0 / (1.0 + l))[None]
    if mode == Tonemapping.ACES:
        # Narkowicz ACES fit (public constants)
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        return jnp.clip((rgb * (a * rgb + b)) /
                        (rgb * (c * rgb + d) + e), 0.0, 1.0)
    if mode == Tonemapping.LUT:
        return sample_lut3d(rgb, lut if lut is not None else neutral_lut())
    raise ValueError(mode)


def _gauss_kernel(sigma, k=9):
    x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / jnp.sum(w)


class BloomPlugin(Plugin):
    """ref: bevy_post_process bloom/ — bright-pass, downsampled separable
    gaussian blur, additive upsample. Runs in POST before tonemapping."""

    def __init__(self, threshold: float = 1.0, intensity: float = 0.2,
                 sigma: float = 2.0, downsample: int = 4):
        self.threshold = threshold
        self.intensity = intensity
        self.sigma = sigma
        self.downsample = downsample

    def build(self, app):
        thr, inten = self.threshold, self.intensity
        ds = self.downsample
        kern = _gauss_kernel(self.sigma)

        @system(name="bloom_pass")
        def bloom_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            rgb = c[:3]                                   # (3, H, W)
            _, h, w = rgb.shape
            hd, wd = h // ds, w // ds
            bright = jnp.maximum(rgb - thr, 0.0)
            down = bright[:, :hd * ds, :wd * ds].reshape(
                3, hd, ds, wd, ds).mean((2, 4))           # (3, hd, wd)
            # separable gaussian via depthwise conv (channels as batch)
            x = down[:, None]                             # (3, 1, hd, wd)
            kh = kern[None, None, :, None]
            kw = kern[None, None, None, :]
            x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
            x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
            blur = x[:, 0]
            up = jnp.repeat(jnp.repeat(blur, ds, 1), ds, 2)
            up = jnp.pad(up, ((0, 0), (0, h - hd * ds), (0, w - wd * ds)))
            out = jnp.concatenate([rgb + up * inten, c[3:4]], axis=0)
            target.color = out

        from bevy_tpu.app.main_schedule import Render
        app.add_systems(Render, bloom_pass, in_set=POST_SET,
                        before="tonemap_pass")


def view_pos_from_depth(depth, fov, aspect, near):
    """Reverse-z infinite-projection depth → view-space position planes
    (3, H, W). Background (depth == 0) maps to a far dummy point."""
    h, w = depth.shape
    zv = near / jnp.maximum(depth, 1e-7)          # view-space distance
    zv = jnp.where(depth > 0, zv, 1e6)
    f = 1.0 / jnp.tan(fov * 0.5)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    vx = xs[None, :] * zv * aspect / f
    vy = ys[:, None] * zv / f
    return jnp.stack([vx, vy, -zv])


def _shift(x, dy, dx):
    """Edge-clamped 2D shift of (..., H, W)."""
    if dy:
        x = jnp.roll(x, dy, axis=-2)
        if dy > 0:
            x = x.at[..., :dy, :].set(x[..., dy:dy + 1, :])
        else:
            x = x.at[..., dy:, :].set(x[..., dy - 1:dy, :])
    if dx:
        x = jnp.roll(x, dx, axis=-1)
        if dx > 0:
            x = x.at[..., :, :dx].set(x[..., :, dx:dx + 1])
        else:
            x = x.at[..., :, dx:].set(x[..., :, dx - 1:dx])
    return x


def normals_from_depth(vpos):
    """Screen-space normal reconstruction: cross of view-pos gradients
    (ref: the depth-only normal path of ssao.wesl prepass fallback)."""
    ddx = _shift(vpos, 0, -1) - vpos
    ddy = _shift(vpos, -1, 0) - vpos
    n = jnp.cross(ddx.transpose(1, 2, 0), ddy.transpose(1, 2, 0))
    n = n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True),
                                      1e-12))
    return n.transpose(2, 0, 1)                   # (3, H, W)


class SsaoPlugin(Plugin):
    """Screen-space ambient occlusion (ref: bevy_pbr/src/ssao — GTAO;
    here a spiral-tap horizon estimator over reconstructed view
    positions, multiplied into color before tonemapping)."""

    def __init__(self, radius=1.0, intensity=1.0, samples=8,
                 fov=0.7853982, near=0.1):
        self.radius = radius
        self.intensity = intensity
        self.samples = samples
        self.fov = fov
        self.near = near

    def build(self, app):
        import numpy as np
        rad, inten, ns = self.radius, self.intensity, self.samples
        fov, near = self.fov, self.near
        ang = np.arange(ns) * 2.39996                  # golden-angle spiral
        taps = [(int(round(np.sin(a) * (2 + 3 * i / max(ns - 1, 1)))),
                 int(round(np.cos(a) * (2 + 3 * i / max(ns - 1, 1)))))
                for i, a in enumerate(ang)]

        @system(name="ssao_pass")
        def ssao_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            h, w = target.depth.shape
            vpos = view_pos_from_depth(target.depth, fov, w / h, near)
            nrm = normals_from_depth(vpos)
            occ = jnp.zeros((h, w), jnp.float32)
            for dy, dx in taps:
                sp = _shift(vpos, dy, dx)
                d = sp - vpos                          # (3, H, W)
                dist2 = jnp.sum(d * d, 0)
                ndl = jnp.sum(nrm * d, 0) * jax.lax.rsqrt(
                    jnp.maximum(dist2, 1e-8))
                contrib = jnp.maximum(ndl - 0.1, 0.0) * \
                    (rad * rad / jnp.maximum(dist2 + rad * rad, 1e-8))
                occ = occ + contrib
            ao = jnp.clip(1.0 - occ * (inten / ns) * 2.0, 0.0, 1.0)
            # blur AO slightly (the reference's denoise pass, collapsed)
            ao = (ao + _shift(ao, 0, 1) + _shift(ao, 0, -1) +
                  _shift(ao, 1, 0) + _shift(ao, -1, 0)) / 5.0
            hit = target.depth > 0
            ao = jnp.where(hit, ao, 1.0)
            target.color = jnp.concatenate([c[:3] * ao[None], c[3:4]], 0)

        app.add_systems(Render, ssao_pass, in_set=POST_SET,
                        before="tonemap_pass")


def _camera_vp(cam, width, height):
    from bevy_tpu.render.camera import (
        perspective_infinite_reverse, pick_camera, view_matrix)
    ci, _ = pick_camera(cam.mask)
    gt = cam.global_transform
    view = view_matrix(gt.translation[ci], gt.rotation[ci], gt.scale[ci])
    proj = perspective_infinite_reverse(cam.camera3d.fov[ci],
                                        width / height,
                                        cam.camera3d.near[ci])
    return proj @ view, cam.camera3d.fov[ci], cam.camera3d.near[ci]


def _reproject_uv(depth, vp_prev, inv_vp, fov, near, width, height):
    """Per-pixel previous-frame pixel coordinates via world reprojection
    (clip-space reconstruction → inv(VP) → previous VP).
    Returns (py_prev, px_prev) float planes (H, W)."""
    h, w = depth.shape
    wclip = near / jnp.maximum(depth, 1e-7)        # w = view distance
    wclip = jnp.where(depth > 0, wclip, 1e6)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    clip = jnp.stack([xs[None, :] * wclip, ys[:, None] * wclip,
                      jnp.full((h, w), near, jnp.float32), wclip])
    world = jnp.einsum("ij,jhw->ihw", inv_vp, clip)
    prev = jnp.einsum("ij,jhw->ihw", vp_prev, world)
    pw = jnp.where(jnp.abs(prev[3]) > 1e-8, prev[3], 1.0)
    ndc_x = prev[0] / pw
    ndc_y = prev[1] / pw
    px = (ndc_x * 0.5 + 0.5) * w - 0.5
    py = (0.5 - ndc_y * 0.5) * h - 0.5
    return py, px


class TaaPlugin(Plugin):
    """Temporal anti-aliasing (ref: bevy_anti_alias/src/taa — history
    reprojection + neighborhood clamp). Uses the mesh pass's per-object
    motion vectors where present (target.motion validity plane),
    camera-matrix reprojection elsewhere."""

    def __init__(self, blend=0.125, fov=0.7853982, near=0.1):
        self.blend = blend
        self.fov = fov
        self.near = near

    def build(self, app):
        from bevy_tpu.ecs.query import Query, Read
        from bevy_tpu.render.camera import Camera3d
        from bevy_tpu.transform import GlobalTransform
        blend = self.blend

        @system(name="taa_pass")
        def taa_pass(target=ResMut(RenderTarget.RESOURCE),
                     cam=Query(Read(Camera3d), Read(GlobalTransform)),
                     taa=ResMut("taa_state")):
            c = target.color
            _, h, w = c.shape
            vp, fov, near = _camera_vp(cam, w, h)
            inv_vp = jnp.linalg.inv(vp)
            py, px = _reproject_uv(target.depth, taa.prev_vp, inv_vp, fov,
                                   near, w, h)
            motion = getattr(target, "motion", None)
            if motion is not None:
                # per-object vectors override camera reprojection at
                # pixels the mesh pass covered this frame
                yy_ = jnp.arange(h, dtype=jnp.float32)[:, None]
                xx_ = jnp.arange(w, dtype=jnp.float32)[None, :]
                mv = motion[2] > 0.5
                py = jnp.where(mv, yy_ + motion[0], py)
                px = jnp.where(mv, xx_ + motion[1], px)
            y0 = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
            x0 = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
            hist = taa.history[:, y0, x0]              # (4, H, W) gather
            # neighborhood min/max clamp (3x3) kills ghosting
            lo = c
            hi = c
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s = _shift(c, dy, dx)
                    lo = jnp.minimum(lo, s)
                    hi = jnp.maximum(hi, s)
            hist = jnp.clip(hist, lo, hi)
            offscreen = (px < 0) | (px > w - 1) | (py < 0) | (py > h - 1)
            a = jnp.where(taa.valid & ~offscreen, 1.0 - blend, 0.0)[None]
            out = c * (1.0 - a) + hist * a
            target.color = out
            taa.history = out
            taa.prev_vp = vp
            taa.valid = jnp.ones_like(taa.valid)

        def init_state(world):
            from bevy_tpu.render.plugin import RenderPlugin
            rp = next(p for p in app._plugins
                      if type(p).__name__ == "RenderPlugin")
            if "taa_state" not in world.state["res"]:
                world.state["res"]["taa_state"] = {
                    "history": jnp.zeros((4, rp.height, rp.width),
                                         jnp.float32),
                    "prev_vp": jnp.eye(4, dtype=jnp.float32),
                    "valid": jnp.zeros((), bool),
                }

        app.add_prepare_hook(init_state)
        app.add_systems(Render, taa_pass, in_set=POST_SET,
                        before="tonemap_pass")


class MotionBlurPlugin(Plugin):
    """Camera motion blur (ref: bevy_post_process/src/motion_blur —
    velocity from reprojection, N taps along it)."""

    def __init__(self, strength=0.5, taps=4, fov=0.7853982, near=0.1):
        self.strength = strength
        self.taps = taps
        self.fov = fov
        self.near = near

    def build(self, app):
        strength, ntap = self.strength, self.taps

        from bevy_tpu.ecs.query import Query, Read
        from bevy_tpu.render.camera import Camera3d
        from bevy_tpu.transform import GlobalTransform

        @system(name="motion_blur_pass")
        def motion_blur_pass(target=ResMut(RenderTarget.RESOURCE),
                             cam=Query(Read(Camera3d), Read(GlobalTransform)),
                             mb=ResMut("motion_blur_state")):
            c = target.color
            _, h, w = c.shape
            vp, fov, near = _camera_vp(cam, w, h)
            inv_vp = jnp.linalg.inv(vp)
            py, px = _reproject_uv(target.depth, mb.prev_vp, inv_vp, fov,
                                   near, w, h)
            yy = jnp.arange(h, dtype=jnp.float32)[:, None]
            xx = jnp.arange(w, dtype=jnp.float32)[None, :]
            motion = getattr(target, "motion", None)
            if motion is not None:
                mv = motion[2] > 0.5
                py = jnp.where(mv, yy + motion[0], py)
                px = jnp.where(mv, xx + motion[1], px)
            vy = (py - yy) * strength
            vx = (px - xx) * strength
            acc = c[:3]
            for k in range(1, ntap + 1):
                t = k / ntap
                sy = jnp.clip(jnp.round(yy + vy * t).astype(jnp.int32),
                              0, h - 1)
                sx = jnp.clip(jnp.round(xx + vx * t).astype(jnp.int32),
                              0, w - 1)
                acc = acc + c[:3, sy, sx]
            out = acc / (ntap + 1)
            valid = mb.valid
            rgb = jnp.where(valid, out, c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)
            mb.prev_vp = vp
            mb.valid = jnp.ones_like(mb.valid)

        def init_state(world):
            if "motion_blur_state" not in world.state["res"]:
                world.state["res"]["motion_blur_state"] = {
                    "prev_vp": jnp.eye(4, dtype=jnp.float32),
                    "valid": jnp.zeros((), bool),
                }

        app.add_prepare_hook(init_state)
        app.add_systems(Render, motion_blur_pass, in_set=POST_SET,
                        before="tonemap_pass")


class DepthOfFieldPlugin(Plugin):
    """Depth of field (ref: bevy_post_process/src/dof — circle of
    confusion from focal distance, blended blur levels)."""

    def __init__(self, focal_distance=10.0, focal_range=4.0,
                 max_blur=2, fov=0.7853982, near=0.1):
        self.focal_distance = focal_distance
        self.focal_range = focal_range
        self.max_blur = max_blur
        self.fov = fov
        self.near = near

    def build(self, app):
        fd, fr = self.focal_distance, self.focal_range
        near = self.near
        kern = _gauss_kernel(1.5, 7)

        @system(name="dof_pass")
        def dof_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            rgb = c[:3]
            zv = near / jnp.maximum(target.depth, 1e-7)
            zv = jnp.where(target.depth > 0, zv, fd)
            coc = jnp.clip(jnp.abs(zv - fd) / fr, 0.0, 1.0)   # (H, W)
            x = rgb[:, None]
            kh = kern[None, None, :, None]
            kw = kern[None, None, None, :]
            x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
            x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
            blur1 = x[:, 0]
            x2 = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
            x2 = jax.lax.conv_general_dilated(x2, kw, (1, 1), "SAME")
            blur2 = x2[:, 0]
            t = coc[None]
            out = jnp.where(t < 0.5, rgb * (1 - 2 * t) + blur1 * 2 * t,
                            blur1 * (2 - 2 * t) + blur2 * (2 * t - 1))
            target.color = jnp.concatenate([out, c[3:4]], 0)

        app.add_systems(Render, dof_pass, in_set=POST_SET,
                        before="tonemap_pass")


class ChromaticAberrationPlugin(Plugin):
    """Radial RGB channel offset (ref: bevy_post_process effect stack's
    chromatic aberration)."""

    def __init__(self, strength=2.0):
        self.strength = strength

    def build(self, app):
        s = self.strength

        @system(name="chromatic_aberration_pass")
        def ca_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            _, h, w = c.shape
            yy = (jnp.arange(h, dtype=jnp.float32)[:, None] - h / 2) / h
            xx = (jnp.arange(w, dtype=jnp.float32)[None, :] - w / 2) / h
            oy = jnp.clip(jnp.round(
                jnp.arange(h, dtype=jnp.float32)[:, None] + yy * s
            ).astype(jnp.int32), 0, h - 1)
            ox = jnp.clip(jnp.round(
                jnp.arange(w, dtype=jnp.float32)[None, :] + xx * s
            ).astype(jnp.int32), 0, w - 1)
            r = c[0, oy, ox]
            b = c[2,
                  jnp.clip(2 * jnp.arange(h, dtype=jnp.int32)[:, None] - oy,
                           0, h - 1),
                  jnp.clip(2 * jnp.arange(w, dtype=jnp.int32)[None, :] - ox,
                           0, w - 1)]
            target.color = jnp.stack([r, c[1], b, c[3]], 0)

        app.add_systems(Render, ca_pass, in_set=POST_SET,
                        before="tonemap_pass")


def cas_filter(rgb, strength):
    """AMD CAS on (3, H, W) linear planes: sharpens LOW-contrast detail,
    leaves high-contrast edges alone (ref:
    bevy_anti_alias/src/contrast_adaptive_sharpening, robust_contrast_
    adaptive_sharpening.wesl)."""
    n = _shift(rgb, -1, 0)
    so = _shift(rgb, 1, 0)
    e = _shift(rgb, 0, 1)
    w_ = _shift(rgb, 0, -1)
    mn = jnp.minimum(jnp.minimum(jnp.minimum(n, so),
                                 jnp.minimum(e, w_)), rgb)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(n, so),
                                 jnp.maximum(e, w_)), rgb)
    amp = jnp.sqrt(jnp.clip(
        jnp.minimum(mn, 2.0 - mx) / jnp.maximum(mx, 1e-5), 0.0, 1.0))
    wgt = -amp * (strength * 0.125 + (1 - strength) * 0.2)
    out = (rgb + (n + so + e + w_) * wgt) / (1.0 + 4.0 * wgt)
    return jnp.clip(out, 0.0, 1e9)


def fxaa_filter(rgb, threshold=0.0625):
    """FXAA-style luminance edge anti-aliasing on (3, H, W) planes
    (ref: bevy_anti_alias/src/fxaa — simplified directional blend)."""
    luma = _luminance(rgb)
    ln = _shift(luma, -1, 0)
    ls = _shift(luma, 1, 0)
    le = _shift(luma, 0, 1)
    lw = _shift(luma, 0, -1)
    lmin = jnp.minimum(luma, jnp.minimum(jnp.minimum(ln, ls),
                                         jnp.minimum(le, lw)))
    lmax = jnp.maximum(luma, jnp.maximum(jnp.maximum(ln, ls),
                                         jnp.maximum(le, lw)))
    rng = lmax - lmin
    edge = rng > jnp.maximum(threshold, lmax * 0.125)
    horiz = jnp.abs(ln + ls - 2 * luma) >= jnp.abs(le + lw - 2 * luma)
    blur_h = (rgb + _shift(rgb, -1, 0) + _shift(rgb, 1, 0)) / 3.0
    blur_v = (rgb + _shift(rgb, 0, -1) + _shift(rgb, 0, 1)) / 3.0
    aa = jnp.where(horiz[None], blur_h, blur_v)
    return jnp.where(edge[None], aa, rgb)


def smaa_filter(rgb, threshold=0.05, max_search=8):
    """SMAA-class morphological anti-aliasing (ref:
    bevy_anti_alias/src/smaa — Jimenez SMAA 1x). Vectorized MLAA core:

    1. luma edge detection (top/left edges, SMAA's edge threshold),
    2. unrolled span search along each edge (cumulative-product run
       lengths, `max_search` steps — the SearchTex role),
    3. crossing-edge classification at span ends → revectorized line
       heights, ANALYTIC trapezoid coverage per pixel (computed in
       closed form instead of SMAA's precomputed AreaTex — the texture
       is itself a bake of this integral),
    4. neighborhood blend with the across-edge neighbor.
    """
    luma = _luminance(rgb)

    def sh(a, dy, dx):
        return _shift(a, dy, dx)

    # top edge: contrast between pixel and the one above; left edge:
    # pixel vs the one to its left (SMAA's edgesTex layout)
    e_top = jnp.abs(luma - sh(luma, -1, 0)) > threshold
    e_left = jnp.abs(luma - sh(luma, 0, -1)) > threshold

    def spans(edge, axis):
        """Run lengths (dl, dr) of consecutive edge pixels along axis
        (1 = horizontal spans for top edges; 0 = vertical for left)."""
        def shift_along(a, d):
            return sh(a, 0, d) if axis == 1 else sh(a, d, 0)
        dl = jnp.zeros_like(luma)
        dr = jnp.zeros_like(luma)
        runl = edge.astype(jnp.float32)
        runr = edge.astype(jnp.float32)
        for i in range(1, max_search + 1):
            runl = runl * shift_along(edge, -i).astype(jnp.float32)
            runr = runr * shift_along(edge, i).astype(jnp.float32)
            dl = dl + runl
            dr = dr + runr
        return dl, dr

    def coverage(edge, axis, cross_a, cross_b):
        """Revectorized-line coverage per edge pixel. cross_a/cross_b:
        crossing-edge maps at the perpendicular (+/-) sides — evaluated
        at both span ends to pick the line's end heights."""
        dl, dr = spans(edge, axis)
        ln = dl + dr + 1.0

        def at_end(cross, dist, sign):
            # sample the crossing edge at the span-end pixel boundary:
            # left end = the end pixel's own left/top edge (offset -dl,
            # offset 0 included), right end = one past (offset dr+1)
            d = dist * sign if sign < 0 else (dist + 1.0) * sign
            di = d.astype(jnp.int32)
            lo = 0 if sign < 0 else 1
            out = jnp.zeros_like(luma)
            for i in range(lo, max_search + 2):
                off = i * sign
                val = (sh(cross, 0, off) if axis == 1
                       else sh(cross, off, 0)).astype(jnp.float32)
                out = jnp.where(di == off, val, out)
            return out
        # height at each end: +0.5 when the crossing edge bends toward
        # side A, -0.5 toward side B, 0 when no crossing (open end)
        hl = 0.5 * (at_end(cross_a, dl, -1) - at_end(cross_b, dl, -1))
        hr = 0.5 * (at_end(cross_a, dr, 1) - at_end(cross_b, dr, 1))
        # pixel center position within the span, 0..1
        t = (dl + 0.5) / jnp.maximum(ln, 1.0)
        # per-half revectorization (the shape SMAA's AreaTex bakes):
        # each end's line runs from its height to ZERO at the span
        # middle — L/Z shapes taper, U shapes vanish at the center,
        # and a 1-px span (isolated dot) gets no false coverage
        a = hl * jnp.maximum(1.0 - 2.0 * t, 0.0) + \
            hr * jnp.maximum(2.0 * t - 1.0, 0.0)
        return jnp.where(edge, a, 0.0)

    # horizontal spans (top edges): crossings are LEFT edges in the row
    # above (bend up) vs this row (bend down)
    a_h = coverage(e_top, 1, sh(e_left, -1, 0), e_left)
    # vertical spans (left edges): crossings are TOP edges in the column
    # to the left (bend left) vs this column (bend right)
    a_v = coverage(e_left, 0, sh(e_top, 0, -1), e_top)

    # single weighted resolve (SMAA's neighborhood-blend pass): each
    # pixel mixes its 4 neighbors by the coverage of the edges it
    # touches, the total capped so compounding directions can't erase
    # the pixel
    wt = jnp.abs(a_h)
    wb = jnp.abs(sh(a_h, 1, 0))
    wl = jnp.abs(a_v)
    wr = jnp.abs(sh(a_v, 0, 1))
    s = wt + wb + wl + wr
    scale = jnp.minimum(1.0, 0.75 / jnp.maximum(s, 1e-6))
    wt, wb, wl, wr = wt * scale, wb * scale, wl * scale, wr * scale
    s = wt + wb + wl + wr
    out = rgb * (1 - s[None]) + sh(rgb, -1, 0) * wt[None] + \
        sh(rgb, 1, 0) * wb[None] + sh(rgb, 0, -1) * wl[None] + \
        sh(rgb, 0, 1) * wr[None]
    return out


class SmaaPlugin(Plugin):
    """SMAA 1x morphological anti-aliasing pass (see smaa_filter)."""

    def __init__(self, edge_threshold=0.05, max_search=8):
        self.threshold = edge_threshold
        self.max_search = max_search

    def build(self, app):
        thr, ms = self.threshold, self.max_search

        @system(name="smaa_pass")
        def smaa_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            target.color = jnp.concatenate(
                [smaa_filter(c[:3], thr, ms), c[3:4]], 0)

        app.add_systems(Render, smaa_pass, in_set=POST_SET)


class CasPlugin(Plugin):
    """Contrast-adaptive sharpening pass (see cas_filter)."""

    def __init__(self, strength=0.6):
        self.strength = strength

    def build(self, app):
        s = self.strength

        @system(name="cas_pass")
        def cas_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            target.color = jnp.concatenate(
                [cas_filter(c[:3], s), c[3:4]], 0)

        app.add_systems(Render, cas_pass, in_set=POST_SET,
                        before="tonemap_pass")


class FxaaPlugin(Plugin):
    """FXAA pass (see fxaa_filter)."""

    def __init__(self, edge_threshold=0.0625):
        self.threshold = edge_threshold

    def build(self, app):
        thr = self.threshold

        @system(name="fxaa_pass")
        def fxaa_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            target.color = jnp.concatenate(
                [fxaa_filter(c[:3], thr), c[3:4]], 0)

        app.add_systems(Render, fxaa_pass, in_set=POST_SET)


class TonemappingPlugin(Plugin):
    """ref: Tonemapping component on cameras — global here (one target)."""

    def __init__(self, mode: int = Tonemapping.ACES, exposure: float = 1.0,
                 lut=None):
        self.mode = mode
        self.exposure = exposure
        self.lut = lut        # (n,n,n,3) array for Tonemapping.LUT

    def build(self, app):
        mode, exposure, lut = self.mode, self.exposure, self.lut
        if mode == Tonemapping.LUT and lut is None:
            lut = neutral_lut()

        @system(name="tonemap_pass")
        def tonemap_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            target.color = jnp.concatenate(
                [tonemap(c[:3], mode, exposure, lut), c[3:4]], axis=0)

        app.add_systems(Render, tonemap_pass, in_set=POST_SET)


class AutoExposurePlugin(Plugin):
    """Eye adaptation (ref: bevy_post_process/src/auto_exposure — histogram
    metering + asymmetric brighten/darken speeds; here the meter is the
    mean log2 luminance of the HDR frame, an XLA reduction).

    Runs before tonemapping: scales the frame by a smoothed exposure that
    steers mean luminance toward `target_luma`."""

    def __init__(self, target_luma=0.18, speed_brighten=3.0,
                 speed_darken=1.0, min_exp=-4.0, max_exp=4.0):
        self.target_luma = target_luma
        self.speed_brighten = speed_brighten
        self.speed_darken = speed_darken
        self.min_exp = min_exp
        self.max_exp = max_exp

    def build(self, app):
        target_luma = self.target_luma
        sb, sd = self.speed_brighten, self.speed_darken
        lo, hi = self.min_exp, self.max_exp

        from bevy_tpu.ecs.query import Res

        app.insert_resource("auto_exposure_state", {
            "ev": jnp.zeros((), jnp.float32),
            "valid": jnp.zeros((), jnp.bool_),
        })

        @system(name="auto_exposure_pass")
        def auto_exposure_pass(target=ResMut(RenderTarget.RESOURCE),
                               st=ResMut("auto_exposure_state"),
                               time=Res("time")):
            c = target.color
            luma = (0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2])
            mean_log = jnp.mean(jnp.log2(jnp.maximum(luma, 1e-4)))
            # EV that maps the metered luminance onto the target
            want = jnp.clip(jnp.log2(target_luma) - mean_log, lo, hi)
            dt = time.delta
            speed = jnp.where(want > st.ev, sb, sd)
            blend = 1.0 - jnp.exp(-dt * speed)
            ev = jnp.where(st.valid, st.ev + (want - st.ev) * blend, want)
            st.ev = ev
            st.valid = jnp.ones((), jnp.bool_)
            gain = jnp.exp2(ev)
            target.color = jnp.concatenate([c[:3] * gain, c[3:4]], axis=0)

        from bevy_tpu.app.main_schedule import Render
        app.add_systems(Render, auto_exposure_pass, in_set=POST_SET,
                        before="tonemap_pass")
