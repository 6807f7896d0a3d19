"""Independent O(N²) all-pairs NumPy oracle for the SPH physics.

This is the golden-model referee for the cell-list pipeline (SURVEY §4,
test-pyramid level 2): a deliberately simple, brute-force implementation of
the same net physics the framework computes (Müller kernel set; semantics of
``sph/sph_kernel_impl.cuh`` with the reference's defects fixed). Written in
float64 so it also bounds the fp32 pipeline's rounding error.
"""

from __future__ import annotations

import numpy as np


class Oracle:
    def __init__(self, h, pm, rest_density, gas_stiffness, viscosity,
                 surface_tension, particle_radius, beta, sound_speed,
                 gravity=(0.0, -9.81, 0.0)):
        self.h = h
        self.pm = pm
        self.rd = rest_density
        self.k = gas_stiffness
        self.mu = viscosity
        self.kappa = surface_tension
        self.pr = particle_radius
        self.beta = beta
        self.cs = sound_speed
        self.g = np.asarray(gravity, dtype=np.float64)
        self.kpoly = 315.0 / (64.0 * np.pi * h**9)
        self.kpoly_grad = -945.0 / (32.0 * np.pi * h**9)
        self.kpress_grad = -45.0 / (np.pi * h**6)
        self.kvisc_grad = 15.0 / (2.0 * np.pi * h**3)
        self.kvisc_denum = 2.0 * h**3

    # -- kernels ------------------------------------------------------------
    def w_poly6(self, r2):
        d = np.maximum(self.h**2 - r2, 0.0)
        return np.where(r2 <= self.h**2, self.kpoly * d**3, 0.0)

    def w_poly6_grad(self, rij):
        r2 = np.sum(rij**2, axis=-1)
        d = np.maximum(self.h**2 - r2, 0.0)
        s = np.where(r2 <= self.h**2, self.kpoly_grad * d**2, 0.0)
        return s[..., None] * rij

    def w_spiky_grad(self, rij):
        rl = np.linalg.norm(rij, axis=-1)
        c = (self.h - rl) ** 2
        s = np.where((rl <= self.h) & (rl > 1e-12),
                     self.kpress_grad * c / np.maximum(rl, 1e-12), 0.0)
        return s[..., None] * rij

    def w_visc_grad(self, rij):
        rl = np.linalg.norm(rij, axis=-1)
        rl3 = np.maximum(rl**3, 1e-12)
        c = -(3.0 * rl / self.kvisc_denum) + 2.0 / self.h**2 - self.h / (2.0 * rl3)
        s = np.where((rl <= self.h) & (rl > 1e-12), self.kvisc_grad * c, 0.0)
        return s[..., None] * rij

    # -- physics ------------------------------------------------------------
    def _pairs(self, pos, other=None):
        q = pos if other is None else other
        rij = pos[:, None, :] - q[None, :, :]
        r2 = np.sum(rij**2, axis=-1)
        mask = r2 < self.h**2
        if other is None:
            np.fill_diagonal(mask, False)
        return rij, r2, mask

    def density(self, pos, bpos=None, psi=None):
        rij, r2, mask = self._pairs(pos)
        dens = self.pm * np.sum(np.where(mask, self.w_poly6(r2), 0.0), axis=1)
        dens += self.pm * self.w_poly6(0.0)  # self contribution
        if bpos is not None and len(bpos):
            rib, rb2, bmask = self._pairs(pos, bpos)
            dens += np.sum(np.where(bmask, psi[None, :] * self.w_poly6(rb2), 0.0),
                           axis=1)
        return dens

    def tait(self, dens):
        return self.k * ((dens / self.rd) ** 7 - 1.0)

    def forces(self, pos, vel, dens, pres, bpos=None, psi=None,
               surface_tension=True):
        n = pos.shape[0]
        rij, r2, mask = self._pairs(pos)
        m = self.pm
        d_i = dens[:, None]
        d_j = dens[None, :]
        p_i = pres[:, None]
        p_j = pres[None, :]

        # pressure: −m Σ m (p_i/ρ_i² + p_j/ρ_j²) ∇W_spiky
        grad_p = self.w_spiky_grad(rij)
        coef = m * (p_i / d_i**2 + p_j / d_j**2)
        fp = -m * np.sum(np.where(mask[..., None], coef[..., None] * grad_p, 0.0),
                         axis=1)

        # viscosity: 2 m μ Σ (m/ρ_j)(v_i−v_j)(r·∇W_visc)/(r²+0.01h²)
        grad_v = self.w_visc_grad(rij)
        a = np.sum(rij * grad_v, axis=-1)
        b = r2 + 0.01 * self.h**2
        vij = vel[:, None, :] - vel[None, :, :]
        fv_acc = np.sum(np.where(mask[..., None],
                                 (m / d_j * (a / b))[..., None] * vij, 0.0), axis=1)

        # Becker surface tension: −κ Σ r_ij W(max(|r|, diameter))
        fs = np.zeros_like(fp)
        if surface_tension:
            diam = 2.0 * self.pr
            w = self.w_poly6(r2)
            w_d = self.w_poly6(diam**2)
            w_eff = np.where(r2 > diam**2, w, w_d)
            fs = -self.kappa * np.sum(
                np.where(mask[..., None], w_eff[..., None] * rij, 0.0), axis=1)

        fb = np.zeros_like(fp)
        ffric_acc = np.zeros_like(fp)
        if bpos is not None and len(bpos):
            rib, rb2, bmask = self._pairs(pos, bpos)
            wb = self.w_poly6(rb2)
            gradb = self.w_poly6_grad(rib)
            # adhesion β ψ r W
            fb = np.sum(np.where(bmask[..., None],
                                 (self.beta * psi[None, :] * wb)[..., None] * rib,
                                 0.0), axis=1)
            # boundary pressure: +m Σ m ψ (p_i/ρ_i²) ∇W_poly6 folded into fp
            coefb = -m * psi[None, :] * (p_i / d_i**2)
            fp += -m * np.sum(np.where(bmask[..., None],
                                       coefb[..., None] * gradb, 0.0), axis=1)
            # friction
            nu = (self.mu * self.h * self.cs) / dens**2
            nom = np.maximum(np.sum(vel[:, None, :] * rib, axis=-1), 0.0)
            denom = 1.0 + 0.01 * self.h**2
            pij = -nu[:, None] * nom / denom
            ffric_acc = -np.sum(
                np.where(bmask[..., None],
                         (m * psi[None, :] * pij)[..., None] * gradb, 0.0), axis=1)

        fv = (fv_acc + ffric_acc) * (2.0 * m * self.mu)
        return fp + fv + fs + fb + m * self.g
