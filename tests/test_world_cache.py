"""World irradiance cache tests (ref: bevy_solari world_cache_*.wesl —
query/claim/probe, life decay, adaptive temporal blend, and the
one-hop-per-frame multi-bounce propagation)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.render.world_cache import (
    LIFETIME, cache_decay, cache_query, cache_update, cell_size,
    make_world_cache,
)


def _q(cache, pos, nrm, view=None, u=0.0):
    pos = jnp.asarray(pos, jnp.float32)
    nrm = jnp.asarray(nrm, jnp.float32)
    view = jnp.zeros(3) if view is None else jnp.asarray(view, jnp.float32)
    uu = jnp.full(pos.shape[:-1], u, jnp.float32)
    return cache_query(cache, pos, nrm, view, uu)


def test_miss_claims_then_hits():
    c = make_world_cache(1024)
    p = jnp.array([[1.0, 2.0, 3.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    c, rad, hit = _q(c, p, n)
    assert not bool(hit[0]) and float(jnp.sum(rad)) == 0.0
    # claimed: life refreshed, geometry stored
    assert int(jnp.max(c["life"])) == LIFETIME
    k = int(jnp.argmax(c["life"]))
    assert np.allclose(np.asarray(c["pos"][k]), [1.0, 2.0, 3.0])
    # seed radiance and re-query: now a hit returning it
    c["radiance"] = c["radiance"].at[k].set(jnp.array([0.5, 0.25, 0.125]))
    c, rad, hit = _q(c, p, n)
    assert bool(hit[0])
    assert np.allclose(np.asarray(rad[0]), [0.5, 0.25, 0.125])


def test_same_cell_different_normal_is_distinct():
    c = make_world_cache(1024)
    p = jnp.array([[0.1, 0.1, 0.1], [0.1, 0.1, 0.1]])
    n = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    c, _, _ = _q(c, p, n)
    assert int(jnp.sum(c["life"] > 0)) == 2   # two cells claimed


def test_lod_cell_size_grows_with_distance():
    near = cell_size(jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3),
                     jnp.asarray(0.0))
    far = cell_size(jnp.array([0.0, 0.0, 500.0]), jnp.zeros(3),
                    jnp.asarray(0.0))
    assert float(far) > float(near)


def test_decay_clears_dead_cells():
    c = make_world_cache(1024)
    c, _, _ = _q(c, jnp.array([[1.0, 0.0, 0.0]]),
                 jnp.array([[0.0, 1.0, 0.0]]))
    k = int(jnp.argmax(c["life"]))
    c["radiance"] = c["radiance"].at[k].set(1.0)
    for _ in range(LIFETIME - 1):
        c = cache_decay(c)
    assert int(c["life"][k]) == 1
    c = cache_decay(c)
    assert int(c["life"][k]) == 0
    assert int(c["checksum"][k]) == 0
    assert float(jnp.sum(c["radiance"])) == 0.0


def test_di_update_converges_to_analytic():
    """One unshadowed point light: the cell's cached E converges to the
    analytic incident-cos energy (the RIS estimator is unbiased and the
    single-light draw is deterministic here)."""
    c = make_world_cache(1024)
    pos = jnp.array([[0.0, 0.0, 0.0]])
    nrm = jnp.array([[0.0, 1.0, 0.0]])
    c, _, _ = _q(c, pos, nrm)
    lights = {"pos": jnp.array([[0.0, 2.0, 0.0]]),
              "col": jnp.array([[3.0, 3.0, 3.0]]),
              "rng": jnp.array([10.0]),
              "mask": jnp.array([True])}
    for f in range(24):
        c = cache_update(c, f, lights, soup=None, budget=64,
                         view_pos=jnp.zeros(3))
        c["life"] = jnp.maximum(c["life"], (c["checksum"] > 0) * LIFETIME)
    k = int(jnp.argmax(c["samples"]))
    d2 = 4.0
    win = np.clip(1.0 - (d2 / 100.0) ** 2, 0, 1) ** 2
    expect = 3.0 * win / (d2 + 1.0) * 1.0     # cos = 1
    got = float(c["radiance"][k, 0])
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_multibounce_propagates_one_hop_per_frame():
    """Light -> panel A (lit) -> panel B (sees A only indirectly): B's
    cell must stay dark until A's cell has energy, then converge to a
    positive bounce term — the reference's one-cache-hop-per-frame
    multi-bounce (world_cache_update.wesl sample_gi)."""
    from bevy_tpu.render.pathtracer import intersect_chunk  # noqa: F401

    # big panel A at x=0 (normal +x, spans yz [-4,4]) and a SMALL panel
    # B at x=1 (normal -x, spans [-0.2, 0.2]). The light sits at x=2:
    # in front of A (direct-lit; its shadow rays clear the small B) and
    # BEHIND B's facing (cos <= 0 -> no direct). B's only energy is the
    # bounce off A, carried through A's cache cells.
    big, sm = 4.0, 0.2
    v0 = jnp.array([[0.0, -big, -big], [0.0, big, big],
                    [1.0, -sm, -sm], [1.0, sm, sm]], jnp.float32)
    e1 = jnp.array([[0.0, 2 * big, 0.0], [0.0, -2 * big, 0.0],
                    [0.0, 2 * sm, 0.0], [0.0, -2 * sm, 0.0]], jnp.float32)
    e2 = jnp.array([[0.0, 0.0, 2 * big], [0.0, 0.0, -2 * big],
                    [0.0, 0.0, 2 * sm], [0.0, 0.0, -2 * sm]], jnp.float32)
    soup = {"v0": v0, "e1": e1, "e2": e2,
            "n": jnp.array([[1.0, 0, 0], [1.0, 0, 0],
                            [-1.0, 0, 0], [-1.0, 0, 0]], jnp.float32),
            "alb": jnp.full((4, 3), 0.8, jnp.float32),
            "emi": jnp.zeros((4, 3), jnp.float32)}
    lights = {"pos": jnp.array([[2.0, 0.0, 0.0]]),
              "col": jnp.array([[5.0, 5.0, 5.0]]),
              "rng": jnp.array([20.0]),
              "mask": jnp.array([True])}
    c = make_world_cache(4096)
    pa = jnp.array([[0.0, 0.5, 0.5]])
    na = jnp.array([[1.0, 0.0, 0.0]])
    pb = jnp.array([[1.0, 0.0, 0.0]])
    nb = jnp.array([[-1.0, 0.0, 0.0]])
    c, _, _ = _q(c, pa, na)
    c, _, _ = _q(c, pb, nb)
    ka_mask = None
    for f in range(40):
        c = cache_update(c, f, lights, soup=soup, budget=128,
                         view_pos=jnp.zeros(3), di_samples=2)
        c["life"] = jnp.maximum(c["life"], (c["checksum"] > 0) * LIFETIME)
    # locate A and B cells by stored geometry
    live = np.asarray(c["checksum"]) > 0
    poss = np.asarray(c["pos"])
    nrms = np.asarray(c["normal"])
    e = np.asarray(c["radiance"])
    a_cells = live & (nrms[:, 0] > 0.5)
    b_cells = live & (nrms[:, 0] < -0.5)
    assert a_cells.any() and b_cells.any()
    ea = e[a_cells].sum(-1).max()
    eb = e[b_cells].sum(-1).max()
    assert ea > 0.01, "A never got direct light"
    assert eb > 1e-4, "B never received the bounce from A"
    assert eb < ea, "bounce energy must be below the direct source"


def test_query_batch_shapes():
    c = make_world_cache(1024)
    p = jnp.zeros((4, 5, 3))
    n = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (4, 5, 1))
    c, rad, hit = _q(c, p, n)
    assert rad.shape == (4, 5, 3) and hit.shape == (4, 5)
