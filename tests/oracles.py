"""Independent numpy oracles for geometry math.

These are deliberately written in the most literal scalar/loop style possible
(separately derived from the algorithm definitions, not from the framework's
vectorized JAX code) so they can catch vectorization and layout bugs in the
production implementations.
"""

from __future__ import annotations

import numpy as np


def rodrigues_single(aa: np.ndarray) -> np.ndarray:
    theta = float(np.linalg.norm(aa))
    if theta < 1e-8:
        # Small-angle: the production code normalizes by max(theta, eps); with
        # theta ~ 0 this is effectively the identity.
        K = np.array(
            [[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]], dtype=np.float64
        )
        return np.eye(3) + K
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64)
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def lbs_single(
    betas: np.ndarray,
    pose: np.ndarray,
    v_template: np.ndarray,
    shapedirs: np.ndarray,  # (V, 3, L)
    posedirs: np.ndarray,  # (36, V*3)
    j_regressor: np.ndarray,  # (J, V)
    parents: list,
    lbs_weights: np.ndarray,  # (V, J)
) -> np.ndarray:
    """One-sample LBS in literal loops. Returns (V, 3)."""
    V = v_template.shape[0]
    J = j_regressor.shape[0]

    # 1. blend shapes
    v_shaped = v_template.astype(np.float64).copy()
    for l in range(betas.shape[0]):
        v_shaped += betas[l] * shapedirs[:, :, l]

    # 2. joints
    joints = j_regressor.astype(np.float64) @ v_shaped  # (J, 3)

    # 3. per-joint rotations
    rots = [rodrigues_single(pose[3 * j : 3 * j + 3]) for j in range(J)]

    # 4. pose correctives
    feature = np.concatenate([(rots[j] - np.eye(3)).reshape(-1) for j in range(1, J)])
    v_posed = v_shaped + (feature @ posedirs.astype(np.float64)).reshape(V, 3)

    # 5. kinematic chain
    world = [None] * J
    for j in range(J):
        T = np.eye(4)
        T[:3, :3] = rots[j]
        if parents[j] < 0:
            T[:3, 3] = joints[j]
            world[j] = T
        else:
            T[:3, 3] = joints[j] - joints[parents[j]]
            world[j] = world[parents[j]] @ T
    rel = []
    for j in range(J):
        A = world[j].copy()
        A[:3, 3] -= A[:3, :3] @ joints[j]
        rel.append(A)

    # 6. skinning — evaluated joint-by-joint (a different order than the
    # production code, which blends the transforms first).
    out = np.zeros((V, 3))
    homo = np.concatenate([v_posed, np.ones((V, 1))], axis=1)  # (V, 4)
    for j in range(J):
        out += lbs_weights[:, j : j + 1] * (homo @ rel[j].T)[:, :3]
    return out


def rot6dof_single(v6: np.ndarray) -> np.ndarray:
    vx, vy = v6[:3].astype(np.float64), v6[3:].astype(np.float64)
    b1 = vx / np.linalg.norm(vx)
    c = np.cross(b1, vy)
    b3 = c / np.linalg.norm(c)
    b2 = -np.cross(b1, b3)
    return np.stack([b1, b2, b3], axis=-1)
