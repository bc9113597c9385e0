"""Unit tests for the bench.py measurement helpers.

The bench artifact is the contract evidence for the BASELINE.json scaling
criterion, so the pure arithmetic under it (clean-rep selection, level
merging for the salvage pass, pair efficiency) is pinned here. No Spark
session needed — these are plain-Python helpers.
"""

import statistics

import bench


def _burst(walls, ext_busy=0.0, pin_steal=0.0, calib=0.5, calib_pre=None,
           calib_post=None):
    if calib_pre is not None or calib_post is not None:
        calib_pre = calib if calib_pre is None else calib_pre
        calib_post = calib if calib_post is None else calib_post
        calib = max(calib_pre, calib_post)
    else:
        calib_pre = calib_post = calib
    return {
        "walls": list(walls),
        "ext_busy": ext_busy,
        "pin_steal": pin_steal,
        "calib": calib,
        "calib_pre": calib_pre,
        "calib_post": calib_post,
    }


def _level(cores, bursts, elapsed=100.0):
    best_cal = min(
        min(b["calib_pre"], b["calib_post"] or b["calib_pre"]) for b in bursts
    )
    for b in bursts:
        b["valid"] = (
            b["ext_busy"] <= bench.EXT_BUSY_MAX
            and b["pin_steal"] <= bench.STEAL_MAX
            and b["calib"] <= best_cal * bench.CALIB_TOL
        )
    valid = [w for b in bursts if b["valid"] for w in b["walls"]]
    walls = [w for b in bursts for w in b["walls"]]
    basis = valid if len(valid) >= 2 else walls
    return {
        "cores": cores,
        "walls": basis,
        "all_walls": walls,
        "min_wall": min(basis),
        "bursts": bursts,
        "level_elapsed_s": elapsed,
        "level_budget_s": 600,
        **bench._converged(valid),
    }


class TestMinClean:
    def test_prefers_steal_clean_reps(self):
        # the dirty rep is faster but was stolen — must be excluded
        assert bench.min_clean([5.0, 9.0, 8.5], [0.5, 0.0, 0.01]) == 8.5

    def test_falls_back_to_all_when_no_clean_rep(self):
        assert bench.min_clean([5.0, 6.0], [0.5, 0.6]) == 5.0


class TestMergeLevels:
    def test_merge_adds_samples_and_tightens_min(self):
        l1 = _level(8, [_burst([10.0, 10.5])])
        l2 = _level(8, [_burst([9.8, 10.1])], elapsed=80.0)
        m = bench._merge_levels(l1, l2)
        assert m["min_wall"] == 9.8
        assert m["merged"] is True
        assert len(m["bursts"]) == 2
        assert sorted(m["all_walls"]) == [9.8, 10.0, 10.1, 10.5]
        assert m["level_elapsed_s"] == 180.0

    def test_merge_converges_union_that_neither_half_did(self):
        # each half has one valid burst with a single wall -> <2 valid
        # walls -> not converged alone; the union has 2 agreeing walls
        l1 = _level(8, [_burst([10.0])])
        l2 = _level(8, [_burst([10.2])])
        assert not l1["converged"] and not l2["converged"]
        m = bench._merge_levels(l1, l2)
        assert m["converged"] is True

    def test_merge_excludes_contended_bursts(self):
        l1 = _level(8, [_burst([10.0, 10.3])])
        noisy = _level(8, [_burst([30.0], ext_busy=0.9, pin_steal=0.2)])
        m = bench._merge_levels(l1, noisy)
        assert m["min_wall"] == 10.0
        assert [b["valid"] for b in m["bursts"]] == [True, False]
        # contended walls stay visible in the evidence, just not the basis
        assert 30.0 in m["all_walls"] and 30.0 not in m["walls"]

    def test_merge_recomputes_calib_validity_over_union(self):
        # l1's burst was the best climate seen in ITS run so it was valid;
        # l2 finds a much quieter window, so the union must invalidate l1
        l1 = _level(8, [_burst([13.0, 13.2], calib=0.80)])
        l2 = _level(8, [_burst([10.0, 10.1], calib=0.50)])
        m = bench._merge_levels(l1, l2)
        assert [b["valid"] for b in m["bursts"]] == [False, True]
        assert m["min_wall"] == 10.0
        assert m["converged"] is True


class TestConverged:
    def test_median_route(self):
        c = bench._converged([10.0, 10.2])
        assert c["converged"] and c["converged_median"]
        assert not bench._converged([10.0, 12.0])["converged"]
        assert not bench._converged([10.0])["converged"]

    def test_floor_route_survives_inflated_median(self):
        # the observed 16c pattern: a reproduced floor + undetectable
        # neighbor episodes inflating half the walls -> median route
        # fails, floor route (two best within AGREE_TOL/2, >=4 walls)
        # converges
        walls = [25.38, 25.77, 30.64, 32.50]
        c = bench._converged(walls)
        assert not c["converged_median"]
        assert c["converged_floor"] and c["converged"]
        # 3 walls are not enough evidence for the floor route (and here
        # the median — the middle wall — disagrees with the min)
        assert not bench._converged([25.38, 30.64, 32.50])["converged"]
        # nor is a non-reproduced floor (gap > AGREE_TOL/2)
        assert not bench._converged([25.0, 26.5, 30.0, 32.0])["converged"]

    def test_post_burst_calibration_invalidates_midburst_noise(self):
        # burst 2's walls are slow with a clean PRE calibration — only the
        # POST bracket (the next idle window's sample) sees the episode;
        # its walls must leave the basis
        clean = _burst([10.0, 10.1])
        dirty = _burst([13.0, 13.4], calib_pre=0.5, calib_post=0.9)
        lvl = _level(8, [clean, dirty])
        assert [b["valid"] for b in lvl["bursts"]] == [True, False]
        assert lvl["walls"] == [10.0, 10.1]
        assert lvl["converged"]

    def test_merge_tolerates_open_post_bracket(self):
        # a burst whose post-bracket never closed (level ended on budget)
        # merges on its pre sample alone
        open_b = _burst([10.0, 10.2])
        open_b["calib_post"] = None
        l1 = _level(8, [open_b])
        l2 = _level(8, [_burst([10.1, 10.3])])
        m = bench._merge_levels(l1, l2)
        assert all(b["valid"] for b in m["bursts"])
        assert m["converged"] and m["min_wall"] == 10.0


class TestAnnotateHw:
    def _pair(self):
        ln = _level(4, [_burst([100.0, 104.0])])
        l4 = _level(16, [_burst([30.0, 31.0])])
        return bench._make_pair(4, 16, 1_200_000, ln, l4)

    def test_adjusts_by_matching_ratio(self):
        p = self._pair()
        hw = {"percore_ratio": {"2->8": 0.95, "4->16": 0.86}}
        bench._annotate_hw([p], hw)
        assert p["hw_percore_ratio"] == 0.86
        assert p["efficiency_hw_adj"] == round(p["efficiency"] / 0.86, 3)
        assert p["efficiency_median_hw_adj"] == round(
            p["efficiency_median"] / 0.86, 3
        )

    def test_noop_without_calibration_or_matching_key(self):
        p = self._pair()
        bench._annotate_hw([p], None)
        assert "efficiency_hw_adj" not in p
        bench._annotate_hw([p], {"percore_ratio": {"2->8": 0.9}})
        assert "efficiency_hw_adj" not in p

    def test_raw_efficiency_untouched(self):
        p = self._pair()
        raw = p["efficiency"]
        bench._annotate_hw([p], {"percore_ratio": {"4->16": 0.8}})
        assert p["efficiency"] == raw  # disclosure only, contract unchanged


class TestMakePair:
    def test_efficiency_from_min_and_median(self):
        ln = _level(2, [_burst([100.0, 104.0])])
        l4 = _level(8, [_burst([30.0, 31.0])])
        p = bench._make_pair(2, 8, 600_000, ln, l4)
        assert p["t_n"] == 100.0 and p["t_4n"] == 30.0
        assert p["efficiency"] == round(100.0 / (4 * 30.0), 3)
        assert p["efficiency_median"] == round(102.0 / (4 * 30.5), 3)
        assert p["converged"] is True
        assert p["docs_per_sec_4n"] == round(600_000 / 30.0, 1)

    def test_pair_not_converged_when_either_level_is_not(self):
        ln = _level(2, [_burst([100.0, 120.0])])  # min/median disagree >tol
        l4 = _level(8, [_burst([30.0, 30.5])])
        assert not ln["converged"]
        p = bench._make_pair(2, 8, 600_000, ln, l4)
        assert p["converged"] is False
