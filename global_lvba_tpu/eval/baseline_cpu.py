"""Single-threaded numpy re-statement of the BALM factor evaluation.

Serves two purposes:
  * bench.py's `vs_baseline` denominator — the reference repo publishes no
    benchmark numbers (SURVEY.md §6), so the per-iteration CPU cost of the
    same per-voxel math (the work acc_evaluate2 does per voxel,
    /root/reference/include/BALM/bavoxel.hpp:68-174) is measured here as
    the stand-in baseline, single-threaded numpy;
  * an independent oracle for the fused device kernel in tests.
"""

from __future__ import annotations

import numpy as np


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def numpy_plane_cost_grad_hess(n, mu, Pc, frame, R, p, W):
    """Loop-over-voxels evaluation. Arrays as in PlaneFactorBucket (V, K...)."""
    V, K = n.shape
    H = np.zeros((W * 6, W * 6))
    g = np.zeros(W * 6)
    resid = 0.0
    for v in range(V):
        ks = [k for k in range(K) if n[v, k] > 0]
        if not ks:
            continue
        N = float(sum(n[v, k] for k in ks))
        # aggregate world moments
        P_tot = np.zeros((3, 3))
        v_tot = np.zeros(3)
        for k in ks:
            f = int(frame[v, k])
            nn = float(n[v, k])
            muk = mu[v, k].astype(np.float64)
            Praw = Pc[v, k].astype(np.float64) + nn * np.outer(muk, muk)
            vsum = nn * muk
            Rv = R[f] @ vsum
            v_tot += Rv + nn * p[f]
            rp = np.outer(Rv, p[f])
            P_tot += R[f] @ Praw @ R[f].T + rp + rp.T + nn * np.outer(p[f], p[f])
        vbar = v_tot / N
        cov = P_tot / N - np.outer(vbar, vbar)
        lams, U = np.linalg.eigh(cov)
        uk = U[:, 0]
        resid += lams[0]
        umumT = np.zeros((3, 3))
        for i in (1, 2):
            umumT += 2.0 / (lams[0] - lams[i]) * np.outer(U[:, i], U[:, i])
        Auk = {}
        wv = {}
        jj = {}
        for k in ks:
            f = int(frame[v, k])
            nn = float(n[v, k])
            muk = mu[v, k].astype(np.float64)
            Praw = Pc[v, k].astype(np.float64) + nn * np.outer(muk, muk)
            vi = nn * muk
            Ri = R[f]
            RiTuk = Ri.T @ uk
            w = np.cross(vi, RiTuk)
            ti_v = p[f] - vbar
            a = uk @ ti_v
            PiRiTuk = Praw @ RiTuk
            combo1 = _hat(PiRiTuk) + _hat(vi) * a
            combo2 = Ri @ vi + nn * ti_v
            A = np.zeros((3, 6))
            A[:, 0:3] = (Ri @ Praw + np.outer(ti_v, vi)) @ _hat(RiTuk) - Ri @ combo1
            A[:, 3:6] = np.outer(combo2, uk) + (combo2 @ uk) * np.eye(3)
            A /= N
            Auk[k] = A
            wv[k] = w
            jjt = A.T @ uk
            jj[k] = jjt
            g[6 * f : 6 * f + 6] += jjt
            D = np.zeros((6, 6))
            D[0:3, 0:3] = (
                2.0 / N * (combo1 - _hat(RiTuk) @ Praw) @ _hat(RiTuk)
                - 0.5 * _hat(jjt[0:3])
            )
            D[0:3, 3:6] = 2.0 / N * np.outer(w, uk)
            D[3:6, 0:3] = D[0:3, 3:6].T
            D[3:6, 3:6] = 2.0 * nn / N * np.outer(uk, uk)
            H[6 * f : 6 * f + 6, 6 * f : 6 * f + 6] += D
        for ki in ks:
            fi = int(frame[v, ki])
            ni = float(n[v, ki])
            for kj in ks:
                fj = int(frame[v, kj])
                nj = float(n[v, kj])
                B = Auk[ki].T @ umumT @ Auk[kj]
                B[0:3, 0:3] += -2.0 / N / N * np.outer(wv[ki], wv[kj])
                B[0:3, 3:6] += -2.0 * nj / N / N * np.outer(wv[ki], uk)
                B[3:6, 0:3] += -2.0 * ni / N / N * np.outer(uk, wv[kj])
                B[3:6, 3:6] += -2.0 * ni * nj / N / N * np.outer(uk, uk)
                H[6 * fi : 6 * fi + 6, 6 * fj : 6 * fj + 6] += B
    return resid, g, H
