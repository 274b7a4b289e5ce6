"""Terrain classification fusion (slip update).

Rebuilds the capability of the external ``terrain_estimator`` package
consumed by the reference's slip update
(``/root/reference/src/ContactModel.cpp:226-260``): per-wheel class
probability distributions, a visual<->proprioceptive joint probability,
and an RGB encoding so class information rides in MLS patch colours.

Representation: a fixed class count ``NUM_CLASSES`` (<= 3 so the
distribution round-trips losslessly through RGB); a classification is a
``[NUM_CLASSES]`` probability vector; per-frame input is a
``[NUM_WHEELS, NUM_CLASSES]`` array plus a validity mask (the reference
carries a list of ``TerrainClassification{wheel_idx, ...}``).
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_CLASSES = 3


def joint_probability(visual, proprioceptive):
    """P(same class) of two independent classifications
    (``TerrainClassification::jointProbability``).  Broadcasts over
    leading axes; inputs are probability vectors over NUM_CLASSES."""
    num = jnp.sum(visual * proprioceptive, axis=-1)
    den = jnp.linalg.norm(visual, axis=-1) * jnp.linalg.norm(
        proprioceptive, axis=-1
    )
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 1.0)


def to_rgb(classification):
    """Class probabilities -> RGB in [0, 1]
    (``TerrainClassification::toRGB``).  Identity mapping onto the
    first NUM_CLASSES channels."""
    rgb = jnp.zeros(classification.shape[:-1] + (3,), classification.dtype)
    return rgb.at[..., :NUM_CLASSES].set(classification[..., :NUM_CLASSES])


def from_rgb(rgb):
    """RGB -> class probabilities (``TerrainClassification::fromRGB``)."""
    p = rgb[..., :NUM_CLASSES]
    s = jnp.sum(p, axis=-1, keepdims=True)
    return jnp.where(s > 0, p / jnp.maximum(s, 1e-12), 1.0 / NUM_CLASSES)


def per_point_probability(group_id, patch_color, wheel_classifications,
                          wheel_valid, with_mask=False):
    """Slip probability per contact point for ``evaluate_pose``.

    For each contact point: look up the proprioceptive classification of
    its wheel (``wheel_idx == groupId``, ``ContactModel.cpp:236``),
    decode the visual classification from the queried patch colour, and
    take the joint probability.  Points of wheels without a
    classification get probability 1 (no information).

    Args: ``group_id [C]``, ``patch_color [C, 3]``,
    ``wheel_classifications [W, NUM_CLASSES]``, ``wheel_valid [W]``.
    Returns ``[C]``; with ``with_mask`` returns ``(prob [C], has [C])``
    — the mask feeds the slip-point debug capture
    (``SlipPoint``, ``ContactModel.cpp:248-254``: a slip point exists
    only for points whose wheel carried a classification).
    """
    w = wheel_classifications.shape[0]
    gid = jnp.clip(group_id, 0, w - 1)
    prop = wheel_classifications[gid]
    visual = from_rgb(patch_color)
    prob = joint_probability(visual, prop)
    has = (group_id >= 0) & wheel_valid[gid]
    prob = jnp.where(has, prob, 1.0)
    if with_mask:
        return prob, has
    return prob
