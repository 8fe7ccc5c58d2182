"""Statistical comparison of the two positional-dropout placements.

Reference semantics ("table", embedding.py:197): zero entries of the
(2T-1, D) positional table at rate p, scale 1/(1-p) — the bd score
bd[i,j] = z_i · (m(i-j) ⊙ e(i-j)) gets per-(relative-distance,
feature) noise.  Rotated placement ("rotated"): zero entries of the
rotated position-query u at the same rate — bd[i,j] = drop(u_i) · V_j
gets per-(query, frequency) noise.

Both are exactly expectation-preserving (E[drop(x)] = x), so E[bd] is
the clean score either way; what differs is the noise's correlation
structure.  This script measures, on a trained-scale random projection:

  - empirical E[bd] error vs the clean bd (both schemes -> ~0 as N grows)
  - per-element noise std of each scheme (comparable magnitude)

The correlation structure differs by construction — table noise is
shared along i-j = const diagonals, rotated noise along query rows —
which is exactly the documented deviation; magnitude and mean are the
equivalence claim this script checks.

Measured (T=64, D=64, p=0.1, 400 draws): fold identity exact; E[bd]
rel err 0.0181 (table) vs 0.0169 (rotated), both within the CLT bound
0.0232; per-element noise std 0.945 vs 0.934.

Run (CPU fine):  python tools/analyze_pos_dropout_equivalence.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=64)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--draws", type=int, default=400)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from lasr_tpu.modules.attention import _rot_tables
    from lasr_tpu.modules.embedding import sinusoid_table

    T, D, p = args.T, args.D, args.rate
    rng = np.random.default_rng(0)
    # q_v-side projected query and pos projection, trained-scale magnitudes
    z = rng.standard_normal((T, D)).astype(np.float32) * 0.5
    W_pos = rng.standard_normal((D, D)).astype(np.float32) / np.sqrt(D)

    # reference table layout: rows are relative distances T-1 .. -(T-1)
    pos_part = sinusoid_table(T, D)[::-1]
    neg_part = sinusoid_table(T, D, negative=True)[1:]
    e = np.concatenate([pos_part, neg_part], 0).astype(np.float32)  # (2T-1,D)

    # clean bd as the reference computes it: project the table with
    # linear_pos, score, rel-shift — column j of row i reads table index
    # (T-1) - i + j
    idx = (T - 1) - np.arange(T)[:, None] + np.arange(T)[None, :]
    pe_clean = e @ W_pos
    zq = z                                             # (T, D)
    scores = zq @ pe_clean.T                           # (T, 2T-1)
    bd_clean = np.take_along_axis(scores, idx, axis=1)  # (T, T)

    key = jax.random.PRNGKey(1)

    # rotated-space clean check: u·V must equal bd_clean
    Wt, V = _rot_tables(T, D)
    zr = zq @ W_pos.T                                  # fold contracts W into q
    si, ci = Wt[:, 0::2], Wt[:, 1::2]
    zs, zc = zr[:, 0::2], zr[:, 1::2]
    u = np.empty_like(zr)
    u[:, 0::2] = zs * si + zc * ci
    u[:, 1::2] = zc * si - zs * ci
    bd_rot_clean = u @ V.T
    fold_err = float(np.max(np.abs(bd_rot_clean - bd_clean))
                     / max(1e-9, np.max(np.abs(bd_clean))))

    sum_t = np.zeros((T, T)); sumsq_t = np.zeros((T, T))
    sum_r = np.zeros((T, T)); sumsq_r = np.zeros((T, T))
    for d in range(args.draws):
        key, k1, k2 = jax.random.split(key, 3)
        m_t = (jax.random.uniform(k1, e.shape) >= p) / (1 - p)
        tab = e * np.asarray(m_t, np.float32)
        s = zq @ (tab @ W_pos).T
        bd_t = np.take_along_axis(s, idx, axis=1)
        sum_t += bd_t; sumsq_t += bd_t ** 2

        m_r = (jax.random.uniform(k2, u.shape) >= p) / (1 - p)
        bd_r = (u * np.asarray(m_r, np.float32)) @ V.T
        sum_r += bd_r; sumsq_r += bd_r ** 2

    N = args.draws
    mean_t, mean_r = sum_t / N, sum_r / N
    std_t = np.sqrt(np.maximum(sumsq_t / N - mean_t ** 2, 0))
    std_r = np.sqrt(np.maximum(sumsq_r / N - mean_r ** 2, 0))
    ref = max(1e-9, float(np.abs(bd_clean).mean()))
    out = {
        "fold_identity_rel_err": round(fold_err, 7),
        "E_bd_rel_err_table": round(float(
            np.abs(mean_t - bd_clean).mean()) / ref, 5),
        "E_bd_rel_err_rotated": round(float(
            np.abs(mean_r - bd_clean).mean()) / ref, 5),
        "clt_bound_approx": round(float(
            (std_t.mean() / np.sqrt(N)) / ref), 5),
        "noise_std_mean_table": round(float(std_t.mean()), 5),
        "noise_std_mean_rotated": round(float(std_r.mean()), 5),
        "draws": N, "rate": p, "T": T, "D": D,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
