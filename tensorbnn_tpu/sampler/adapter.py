"""GP-UCB step-size / leapfrog-count adapter (Wang-Mohamed-de Freitas).

From-scratch re-implementation of the behavior of the reference's
``paramAdapter`` (/root/reference/tensorBNN/paramAdapter.py), which tunes the
main chain's (step size, leapfrog count) by Bayesian optimization of the
squared-jumping-distance objective. All the reference's documented
divergences from the paper are reproduced (SURVEY.md #2.3.5), because they
shape the acceptance-rate trajectory the build must match:

* random proposals for the first ``random_steps`` averaging cycles
  (paramAdapter.py:280-284);
* strike-based reset: consecutive SJD < 1e-8 updates beyond the random phase
  count strikes; at ``max_strikes`` the step-size bounds are halved and the
  GP is reset (paramAdapter.py:208-228). Note the reference hard-codes 50 and
  ignores its own ``strikes`` argument (paramAdapter.py:92) — here the
  argument is honored, with default 50 matching effective reference behavior;
* (eps, L) normalized to [-1, 1] for the kernel (paramAdapter.py:104-107),
  which is the *bilinear form* exp(-0.5 g_i^T Sigma g_j), not a distance;
* GP window capped at 50 points, oldest dropped (paramAdapter.py:285-289);
* jitter fallback (+0.1 I) if the covariance is singular
  (paramAdapter.py:263-269);
* update gating probability p = max(i/m - k + 1, 1)^(-1/2)
  (paramAdapter.py:232-234) and UCB beta term
  sqrt(2 log((i/m+1)^3 pi^2 / (3 delta))) (paramAdapter.py:274-277).

Design differences (host-side by design): the adapter consumes the per-epoch
SJD *scalars* the device scan already produced (gibbs.py), so it costs no
extra device traffic; the reference's XLA ``tf.while_loop`` grid search
(paramAdapter.py:158-196) becomes one vectorized NumPy evaluation of the full
(eps, L) grid — a few-ms operation every m epochs. Tie-breaking matches the
reference's first-strict-max in (L-major, eps-fastest) order.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


class ParamAdapter:
    def __init__(self, e1: float, L1: int, el: float, eu: float,
                 e_number: int, Ll: int, Lu: int, l_step: int,
                 m: int, k: float, a: float = 4.0, delta: float = 0.1,
                 max_strikes: int = 50, random_steps: int = 10,
                 seed: int = 0):
        """Arguments mirror the reference constructor (paramAdapter.py:39-93).

        * e1/L1: starting step size and leapfrog count
        * el/eu/e_number: step-size grid bounds and resolution
        * Ll/Lu/l_step: leapfrog grid bounds and stride
        * m: averaging steps per cycle; k: cycles before proposal decay
        * a, delta: paper constants; random_steps: initial random cycles
        """
        self.current_e = float(e1)
        self.current_l = int(L1)
        self.el = float(el)
        self.eu = float(eu)
        self.e_number = int(e_number)
        self.Ll = float(Ll)
        self.Lu = float(Lu)
        self.e_grid = np.linspace(self.el, self.eu, num=self.e_number)
        self.l_grid = np.arange(Ll, Lu + 1, int(l_step), dtype=np.float64)
        self.delta = float(delta)
        kappa = 0.2
        # Sigma = diag(1/(0.4)^2, 1/(0.4)^2) (paramAdapter.py:72-74)
        self.sigma = np.diag([1.0 / (kappa * 2.0) ** 2,
                              1.0 / (kappa * 2.0) ** 2])

        if int(m) < 1:
            raise ValueError(
                f"averaging steps m must be >= 1, got {m} (an m <= 0 would "
                f"make epochs_until_next_change loop forever)")
        self.k = float(k)
        self.m = float(m)
        self.a = float(a)
        self.max_strikes = int(max_strikes)
        self.random_steps = int(random_steps)

        self.rng = np.random.default_rng(seed)
        self._reset_window()
        self.i = -2.0
        self.strikes = 0
        self.n_resets = 0

    # -- internals -------------------------------------------------------------

    def _reset_window(self):
        self.previous_gamma = []      # list of (e, L)
        self.all_data = []            # per-cycle mean SJD
        self.all_sd = []              # per-cycle SJD std
        self.current_data = []        # SJDs inside the current cycle
        self.K = np.zeros((0, 0))
        self.max_r = 1e-8

    def reset(self):
        """Full reset (reference paramAdapter.py:143-156)."""
        self._reset_window()
        self.i = -2.0
        self.strikes = 0
        self.n_resets += 1

    def _normalize(self, gammas: np.ndarray) -> np.ndarray:
        """Maps (e, L) pairs to [-1, 1]^2 (paramAdapter.py:104-107)."""
        out = np.empty_like(gammas, dtype=np.float64)
        out[:, 0] = -1.0 + 2.0 * (gammas[:, 0] - self.el) / (self.eu - self.el)
        out[:, 1] = -1.0 + 2.0 * (gammas[:, 1] - self.Ll) / (self.Lu - self.Ll)
        return out

    def _kernel(self, g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
        """Bilinear 'kernel' exp(-0.5 g1 Sigma g2^T) on normalized points."""
        n1 = self._normalize(np.atleast_2d(g1))
        n2 = self._normalize(np.atleast_2d(g2))
        return np.exp(-0.5 * (n1 @ self.sigma @ n2.T))

    def _grid_search(self, inverse, inverse_r, s, p, rootbeta) -> Tuple[float, float]:
        """Vectorized UCB argmax over the full (eps, L) grid.

        Replaces the reference's element-at-a-time XLA while-loop
        (paramAdapter.py:158-196) with one dense evaluation. Grid order is
        L-major with eps varying fastest, and ``argmax`` takes the first
        strict maximum — identical selection to the reference's sequential
        strict-``>`` scan.
        """
        ee, ll = np.meshgrid(self.e_grid, self.l_grid)  # (lN, eN), L-major
        grid = np.stack([ee.ravel(), ll.ravel()], axis=1)  # (G, 2)
        prev = np.asarray(self.previous_gamma, dtype=np.float64)  # (n, 2)

        k_pg = self._kernel(prev, grid)                      # (n, G)
        mean = (k_pg.T @ inverse_r).ravel() * s              # (G,)
        quad = np.einsum("ng,ng->g", k_pg, inverse @ k_pg)   # (G,)
        norm_grid = self._normalize(grid)
        k_tt = np.exp(-0.5 * np.einsum(
            "gi,ij,gj->g", norm_grid, self.sigma, norm_grid))
        ucb = mean + (k_tt - quad) * p * rootbeta
        best = int(np.argmax(ucb))
        return float(grid[best, 0]), float(grid[best, 1])

    # -- public API --------------------------------------------------------------

    def update(self, sjd: Optional[float]) -> Tuple[float, int]:
        """One adapter step; ``sjd`` is the epoch's squared jumping distance
        (already scaled by L^-1/2 on device), or None for the very first
        epoch (the reference has no previous state then,
        paramAdapter.py:216-219).

        Returns the (step size, leapfrog count) to use for the next epoch.
        """
        # strike-triggered halving + reset (paramAdapter.py:208-214)
        if self.i < self.k - 2 and self.strikes == self.max_strikes:
            self.el = self.el / 2.0
            self.eu = self.eu / 2.0
            self.e_grid = np.linspace(self.el, self.eu, num=self.e_number)
            self.k = self.k - self.i - 2.0
            self.reset()
            # the reference's reset() nulls previous_state, so the update
            # that performed the halving computes no SJD and appends nothing
            # (paramAdapter.py:148, 216-219) — discard this epoch's SJD too
            sjd = None

        if sjd is not None:
            sjd = float(sjd)
            self.current_data.append(sjd)
            if sjd < 1e-8 and self.i // self.m > self.random_steps:
                self.strikes += 1
            else:
                self.strikes = 0

        if self.i % self.m == 0 and self.i > 0:
            u = float(self.rng.uniform())
            self.p = max(self.i / self.m - self.k + 1.0, 1.0) ** (-0.5)
            if u < self.p:
                self._gp_update()

        self.i += 1.0
        return self.current_e, int(self.current_l)

    def _gp_update(self):
        """One GP/proposal cycle (paramAdapter.py:235-289)."""
        data = np.asarray(self.current_data, dtype=np.float64)
        mean = float(np.mean(data))
        sd = float(np.std(data))  # population std, like tf.reduce_std
        self.current_data = []
        self.all_data.append(mean)
        self.all_sd.append(sd)
        self.max_r = max(self.all_data)

        self.previous_gamma.append((self.current_e, float(self.current_l)))
        size = len(self.previous_gamma)
        prev = np.asarray(self.previous_gamma, dtype=np.float64)
        new_col = self._kernel(prev, prev[-1:])  # (size, 1)
        new_k = np.zeros((size, size))
        new_k[: size - 1, : size - 1] = self.K
        new_k[-1, :] = new_col[:, 0]
        new_k[:, -1] = new_col[:, 0]
        self.K = new_k

        # TF float division: a/0 -> inf rather than raising (dead chains
        # produce all-zero SJD windows before the strike reset fires)
        with np.errstate(divide="ignore"):
            s = float(np.float64(self.a) / np.float64(self.max_r))
        sigma_nu = float(np.mean(self.all_sd))
        reg = self.K + (sigma_nu ** 2) * np.eye(size)
        try:
            inverse = np.linalg.inv(reg)
        except np.linalg.LinAlgError:
            inverse = np.linalg.inv(reg + 0.1 * np.eye(size))
        inverse_r = inverse @ np.asarray(self.all_data)[:, None]

        rootbeta = (self.i / self.m + 1.0) ** 3 * math.pi ** 2
        rootbeta /= 3.0 * self.delta
        rootbeta = math.sqrt(2.0 * math.log(rootbeta))

        if self.i // self.m >= self.random_steps:
            if not np.isfinite(s):
                # every recorded SJD is zero (max_r == 0): the GP mean is
                # 0*inf = NaN and the reference's sequential strict-> scan
                # over NaN UCBs keeps its initial (el, Ll) candidate
                # (paramAdapter.py:165-185); select that explicitly instead
                # of relying on argmax-over-NaN returning index 0
                self.current_e, self.current_l = self.el, int(self.Ll)
            else:
                e, l = self._grid_search(inverse, inverse_r, s, self.p,
                                         rootbeta)
                self.current_e, self.current_l = e, int(l)
        else:
            self.current_e = float(self.rng.choice(self.e_grid))
            self.current_l = int(self.rng.choice(self.l_grid))

        # window cap (paramAdapter.py:285-289)
        if size == 50:
            self.K = self.K[1:, 1:]
            self.previous_gamma = self.previous_gamma[1:]
            self.all_data = self.all_data[1:]
            self.all_sd = self.all_sd[1:]

    def state_dict(self) -> dict:
        """Serializable adapter state for true mid-chain resume — a
        capability the reference lacks (SURVEY.md #5: RNG/adapter state are
        never saved there)."""
        return {
            "current_e": self.current_e,
            "current_l": self.current_l,
            "el": self.el, "eu": self.eu,
            "k": self.k, "i": self.i,
            "strikes": self.strikes, "n_resets": self.n_resets,
            "previous_gamma": [list(g) for g in self.previous_gamma],
            "all_data": list(self.all_data),
            "all_sd": list(self.all_sd),
            "current_data": list(self.current_data),
            "K": self.K.tolist(),
            "max_r": self.max_r,
            "rng_state": self.rng.bit_generator.state,
        }

    def load_state_dict(self, state: dict) -> None:
        self.current_e = float(state["current_e"])
        self.current_l = int(state["current_l"])
        self.el = float(state["el"])
        self.eu = float(state["eu"])
        self.e_grid = np.linspace(self.el, self.eu, num=self.e_number)
        self.k = float(state["k"])
        self.i = float(state["i"])
        self.strikes = int(state["strikes"])
        self.n_resets = int(state["n_resets"])
        self.previous_gamma = [tuple(g) for g in state["previous_gamma"]]
        self.all_data = list(state["all_data"])
        self.all_sd = list(state["all_sd"])
        self.current_data = list(state["current_data"])
        n = len(self.previous_gamma)
        self.K = np.asarray(state["K"], dtype=np.float64).reshape(n, n)
        self.max_r = float(state["max_r"])
        self.rng.bit_generator.state = state["rng_state"]

    def epochs_until_next_change(self) -> int:
        """Number of further epochs after which (eps, L) may next change.

        (eps, L) only changes during updates where ``i % m == 0 and i > 0``
        (paramAdapter.py:231). Given the current counter, this returns how
        many more ``update`` calls until that condition next fires — the
        driver uses it to size scan chunks so every dispatch boundary lands
        exactly on a possible parameter change.
        """
        j = 0
        while True:
            i = self.i + j
            # the (j+1)-th update call from now sees counter value i
            if i % self.m == 0 and i > 0:
                return j + 1
            j += 1
