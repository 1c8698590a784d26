"""GP-UCB adapter tests with scripted SJD sequences (SURVEY.md #4)."""

import warnings

import numpy as np
import pytest

from tensorbnn_tpu.sampler.adapter import ParamAdapter


def make_adapter(**kw):
    args = dict(e1=1e-3, L1=1000, el=1e-4, eu=1e-2, e_number=10,
                Ll=100, Lu=1000, l_step=100, m=5, k=20.0,
                random_steps=2, seed=0)
    args.update(kw)
    return ParamAdapter(**args)


def drive(adapter, sjds):
    """Feeds a scripted SJD sequence; returns the (e, L) after each epoch."""
    out = []
    for i, s in enumerate(sjds):
        out.append(adapter.update(None if i == 0 else s))
    return out


def test_proposals_only_change_on_cycle_boundaries():
    ad = make_adapter()
    rng = np.random.default_rng(0)
    sjds = rng.uniform(0.1, 1.0, size=40)
    results = drive(ad, sjds)
    changes = [i for i in range(1, len(results))
               if results[i] != results[i - 1]]
    # i starts at -2: first GP cycle fires at update #(m+3), then every m
    # (SURVEY's call-stack analysis of paramAdapter.py:231)
    m = 5
    for c in changes:
        assert (c + 1 - (m + 3)) % m == 0


def test_random_phase_then_grid_search():
    ad = make_adapter(random_steps=2)
    rng = np.random.default_rng(1)
    results = drive(ad, rng.uniform(0.1, 1.0, size=60))
    # proposals during the random phase come from the grids
    es = {e for e, _ in results}
    for e in es:
        assert np.any(np.isclose(ad.e_grid, e)) or e == 1e-3
    ls = {l for _, l in results}
    assert all(l in set(ad.l_grid.astype(int)) or l == 1000 for l in ls)


def test_epochs_until_next_change_schedule():
    ad = make_adapter(m=5)
    # from the initial state (i=-2), the first possible change is the update
    # that sees i=5 -> the 8th update call
    assert ad.epochs_until_next_change() == 8
    for i in range(8):
        ad.update(None if i == 0 else 0.5)
    # after that, changes fire every m updates
    assert ad.epochs_until_next_change() == 5


def test_strike_reset_halves_step_bounds():
    ad = make_adapter(m=2, k=100.0, random_steps=0, max_strikes=3)
    el0, eu0 = ad.el, ad.eu
    ad.update(None)
    # feed dead SJDs; strikes only count once i//m > random_steps
    n = 0
    while ad.n_resets == 0 and n < 100:
        ad.update(0.0)
        n += 1
    assert ad.n_resets == 1
    assert ad.el == el0 / 2 and ad.eu == eu0 / 2
    assert ad.e_grid[0] == ad.el and ad.e_grid[-1] == ad.eu
    assert ad.i >= -2  # counter restarted


def test_window_cap_keeps_gp_bounded():
    ad = make_adapter(m=1, k=5.0, random_steps=0)
    rng = np.random.default_rng(2)
    for i in range(400):
        ad.update(None if i == 0 else float(rng.uniform(0.1, 1.0)))
    assert len(ad.previous_gamma) < 50
    assert ad.K.shape[0] == len(ad.previous_gamma)
    assert len(ad.all_data) == len(ad.previous_gamma)


def test_averaging_steps_must_be_positive():
    with pytest.raises(ValueError, match="averaging"):
        make_adapter(m=0)


def test_reset_discards_triggering_epoch_sjd():
    """The update that performs a strike reset must not append its SJD to
    the fresh window (the reference's reset() nulls previous_state, so that
    epoch computes no SJD — paramAdapter.py:148, 216-219)."""
    ad = make_adapter(m=2, k=100.0, random_steps=0, max_strikes=3)
    ad.update(None)
    while ad.n_resets == 0:
        ad.update(0.0)
    # the reset call's own SJD (0.0) was discarded, not seeded into the
    # new cycle's data
    assert ad.current_data == []
    # and the strike counter restarted with the window
    assert ad.strikes == 0


def test_all_zero_sjd_window_selects_grid_origin_without_nan():
    """An all-zero SJD window makes the GP mean 0*inf; the proposal must
    fall back to the grid origin (el, Ll) explicitly, with no NaN
    arithmetic (ADVICE round-1)."""
    ad = make_adapter(m=2, k=100.0, random_steps=0, max_strikes=1000)
    ad.update(None)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        for _ in range(20):
            ad.update(0.0)
    assert ad.current_e == ad.el
    assert ad.current_l == int(ad.Ll)


def test_grid_search_prefers_high_sjd_region():
    """With data showing high SJD at one grid corner, the UCB argmax should
    move toward it (sanity check of the vectorized search)."""
    ad = make_adapter(m=1, k=0.0, random_steps=0, e_number=5,
                      Ll=100, Lu=500, l_step=100)
    # seed the GP window manually: high SJD at (eu, Lu), low elsewhere
    ad.update(None)
    good = (ad.eu, 500.0)
    for i in range(30):
        # alternate proposals: adapter explores; feed SJD correlated with e
        e, l = ad.current_e, ad.current_l
        sjd = 10.0 * (e / ad.eu) + 0.1
        ad.update(sjd)
    # after exploration the chosen step size should be in the upper half
    assert ad.current_e >= (ad.el + ad.eu) / 4
