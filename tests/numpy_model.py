"""Independent float64 NumPy model of one D2Q9-BGK timestep.

Deliberately written in the most literal per-cell style (nested loops over a
tiny grid) so it shares no code or vectorization choices with the jnp/Pallas
implementations it validates.  Physics contract per the reference pipeline:
accelerate row ny-2, pull-stream with periodic wrap, BGK-collide fluid
cells / bounce-back obstacle cells, masked mean of |u|.
"""

import numpy as np

EX = [0, 1, 0, -1, 0, 1, -1, -1, 1]
EY = [0, 0, 1, 0, -1, 1, 1, -1, -1]
OPP = [0, 3, 4, 1, 2, 7, 8, 5, 6]
W = [4.0 / 9.0] + [1.0 / 9.0] * 4 + [1.0 / 36.0] * 4


def init_cells(ny, nx, density):
    f = np.empty((9, ny, nx), dtype=np.float64)
    f[0] = density * 4.0 / 9.0
    f[1:5] = density / 9.0
    f[5:9] = density / 36.0
    return f


def step(f, obstacles, density, accel, omega):
    """One timestep; returns (f_new, av_vel_sum_over_fluid)."""
    ny, nx = f.shape[1:]
    f = f.copy()

    # body force on row ny-2
    w1 = density * accel / 9.0
    w2 = density * accel / 36.0
    r = ny - 2
    for x in range(nx):
        if (
            not obstacles[r, x]
            and f[3, r, x] - w1 > 0.0
            and f[6, r, x] - w2 > 0.0
            and f[7, r, x] - w2 > 0.0
        ):
            f[1, r, x] += w1
            f[5, r, x] += w2
            f[8, r, x] += w2
            f[3, r, x] -= w1
            f[6, r, x] -= w2
            f[7, r, x] -= w2

    out = np.empty_like(f)
    tot_u = 0.0
    for y in range(ny):
        for x in range(nx):
            # pull-stream
            tmp = np.array(
                [f[k, (y - EY[k]) % ny, (x - EX[k]) % nx] for k in range(9)]
            )
            if obstacles[y, x]:
                for k in range(9):
                    out[k, y, x] = tmp[OPP[k]]
                continue
            rho = tmp.sum()
            ux = (tmp[1] + tmp[5] + tmp[8] - tmp[3] - tmp[6] - tmp[7]) / rho
            uy = (tmp[2] + tmp[5] + tmp[6] - tmp[4] - tmp[7] - tmp[8]) / rho
            usq = ux * ux + uy * uy
            for k in range(9):
                eu = EX[k] * ux + EY[k] * uy
                feq = W[k] * rho * (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * usq)
                out[k, y, x] = tmp[k] + omega * (feq - tmp[k])
            tot_u += np.sqrt(usq)
    return out, tot_u
