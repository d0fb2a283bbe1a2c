"""Animation joint masks (reference twin:
examples/animation/animation_masks.rs — an upper-body wave layered over
a lower-body walk via per-node joint masks in the blend graph)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu.animation import AnimationClip, bake_clips
from bevy_tpu.animation.graph import MAX_NODES, AnimationGraph

N_JOINTS = 4          # [root, spine, arm, leg]
UPPER = np.array([0.0, 1.0, 1.0, 0.0], np.float32)   # spine+arm
LOWER = np.array([1.0, 0.0, 0.0, 1.0], np.float32)   # root+leg


def _clip(offsets):
    offsets = np.asarray(offsets, np.float32)

    def pose(t):
        return {"translation": offsets * (1.0 + 0.0 * t),
                "rotation": np.tile(np.asarray([[0, 0, 0, 1]], np.float32),
                                    (N_JOINTS, 1)),
                "scale": np.ones((N_JOINTS, 3), np.float32)}

    return AnimationClip(1.0, pose)


def build_graph():
    # walk moves every joint forward; wave lifts the arm only
    walk = _clip([[1.0, 0, 0]] * N_JOINTS)
    wave = _clip([[0, 2.0, 0]] * N_JOINTS)
    data, counts, rates = bake_clips([walk, wave])
    g = AnimationGraph()
    # masks pick which joints each clip drives (ref: AnimationMask)
    nw = g.add_clip(0, mask=LOWER)
    na = g.add_clip(1, mask=UPPER)
    g.add_blend([nw, na])
    return g, data, counts, rates


def demo():
    g, data, counts, rates = build_graph()

    class Cols:
        times = jnp.zeros((1, MAX_NODES), jnp.float32)
        speeds = jnp.ones((1, MAX_NODES), jnp.float32)
        weights = jnp.asarray(
            [[n.weight for n in g.nodes] +
             [0.0] * (MAX_NODES - len(g.nodes))], jnp.float32)

    pose = g.sample(data, counts, rates, Cols(),
                    jnp.asarray([0], jnp.int32))
    tr = np.asarray(pose["translation"][0])
    print("root/leg follow walk (x=1):", tr[0].round(2).tolist(),
          tr[3].round(2).tolist())
    print("spine/arm follow wave (y=2):", tr[1].round(2).tolist(),
          tr[2].round(2).tolist())
    return tr


if __name__ == "__main__":
    demo()
