"""Hand-computed fixtures for the FrameSelector selection algorithms.

Each case drives the FULL reference semantics (ported from
gs360_FrameSelector.py:1537-1607 motion, :1665-1732 low-light,
:1803-1912 boundary re-optimization) on synthetic score series chosen so
the full and naively-simplified algorithms diverge, with expected
selections derived by hand from the reference's rules.
"""

import math

import numpy as np
import pytest

from gs360x.tools.frameselector import (
    FrameMetrics,
    GroupInfo,
    augment_lowlight_groups,
    augment_motion_segments,
    boundary_reopt,
)


class FakeRecord:
    def __init__(self, index, missing=False):
        self.index = index
        self._missing = missing

    def exists(self):
        return not self._missing


def make(scores, flows=None, brightness=None, missing=()):
    n = len(scores)
    records = [FakeRecord(i, missing=i in missing) for i in range(n)]
    metrics = []
    for i in range(n):
        m = FrameMetrics(score=scores[i])
        m.flow = 0.0 if flows is None else flows[i]
        m.brightness = 0.5 if brightness is None else brightness[i]
        metrics.append(m)
    return records, metrics


def groups_of(n, size):
    return [GroupInfo(start=s, end=min(n, s + size))
            for s in range(0, n, size)]


class TestBoundaryReopt:
    def test_resolves_hard_spacing_violation(self):
        # two segments of 4; initial picks 3 and 4 are adjacent (dist 1 <
        # min_diff 3). The reference swaps to a top-K combination with no
        # hard violation: candidates L={3,1,0(+cur)}, R={4,6,7}. Pair (1,4)
        # keeps dist 3 >= min_diff with the best score sum among
        # violation-free pairs anchored near the centers.
        scores = [0.2, 0.8, 0.1, 0.9, 0.95, 0.1, 0.85, 0.3]
        records, metrics = make(scores)
        groups = groups_of(8, 4)
        out = boundary_reopt(records, metrics, groups, {3, 4}, min_diff=3)
        # hand-derived against the reference's lexicographic objective
        # (-hard, -shortfall, score_sum, initial_pref, stay_pref):
        #   (3,4): hard=1 (dist 1 < 3)                 -> eliminated first
        #   (3,6): hard=0, shortfall (4-3)/4 = 0.25
        #   (1,4): hard=0, shortfall 0.25
        #   (1,6): hard=0, shortfall 0 (dist 5 >= center-dist 4),
        #          score_sum 0.8+0.85 = 1.65          -> best key
        # shortfall outranks raw score, so the crowded-but-sharper pairs
        # (3,6)/(1,4) lose to the well-spread (1,6).
        assert out == {1, 6}

    def test_prefers_high_scores_when_spacing_free(self):
        # no spacing pressure (min_diff 1): keeps the sharpest per segment
        scores = [0.1, 0.9, 0.2, 0.3, 0.2, 0.8, 0.1, 0.4]
        records, metrics = make(scores)
        groups = groups_of(8, 4)
        out = boundary_reopt(records, metrics, groups, {1, 5}, min_diff=1)
        assert out == {1, 5}

    def test_missing_scores_fall_back_to_existing(self):
        scores = [None, None, None, None, 0.5, 0.6, 0.7, 0.8]
        records, metrics = make(scores)
        groups = groups_of(8, 4)
        out = boundary_reopt(records, metrics, groups, {6}, min_diff=1)
        # left segment has no valid score: current=None -> first existing 0
        assert out == {0, 7} or out == {0, 6}


class TestMotionAugment:
    def test_adds_frames_in_high_motion_segment_only(self):
        # segment 0 is static (flow 0.1), segment 1 is fast (flow 5.0).
        # threshold = max(0.5, P80 of positive flows); only segment 1
        # qualifies. budget = ceil(4/2) - 1 = 1, ratio cap round(4*0.4)=2.
        # candidates ranked by (flow, score, -i): frame 6 (flow 6) first;
        # spacing |6-5| < 2 rejects it, next is 7 (flow 5.5): |7-5|=2 ok.
        scores = [0.5] * 8
        flows = [0.1, 0.1, 0.1, 0.1, 5.0, 4.0, 6.0, 5.5]
        records, metrics = make(scores, flows=flows)
        groups = groups_of(8, 4)
        out = augment_motion_segments({1, 5}, groups, list(range(8)),
                                      metrics, min_diff=2)
        assert out == {1, 5, 7}

    def test_no_positive_flow_is_noop(self):
        scores = [0.5] * 4
        flows = [0.0, 0.0, 0.0, 0.0]
        records, metrics = make(scores, flows=flows)
        groups = groups_of(4, 4)
        out = augment_motion_segments({1}, groups, list(range(4)),
                                      metrics, min_diff=1)
        assert out == {1}

    def test_budget_respects_existing_picks(self):
        # span 4, min_diff 4 -> spacing_limit ceil(4/4)=1; one pick already
        # in the segment -> budget 0, nothing added despite high motion
        scores = [0.5] * 4
        flows = [9.0, 9.0, 9.0, 9.0]
        records, metrics = make(scores, flows=flows)
        groups = groups_of(4, 4)
        out = augment_motion_segments({0}, groups, list(range(4)),
                                      metrics, min_diff=4)
        assert out == {0}


class TestLowlightAugment:
    def test_favors_bright_sharp_frames_by_weighted_score(self):
        # budget per segment = round(4 * 0.2) = 1.
        # candidates (not selected): 1, 2, 3.
        # lowlight_score = score * brightness^1.5:
        #   1: 0.9 * 0.1^1.5 = 0.0285
        #   2: 0.5 * 0.9^1.5 = 0.4270  <- winner
        #   3: 0.6 * 0.5^1.5 = 0.2121
        scores = [0.7, 0.9, 0.5, 0.6]
        brightness = [0.5, 0.1, 0.9, 0.5]
        records, metrics = make(scores, brightness=brightness)
        groups = groups_of(4, 4)
        out = augment_lowlight_groups({0}, records, metrics, groups,
                                      min_diff=1)
        assert out == {0, 2}

    def test_spacing_blocks_adjacent_candidate(self):
        # winner by weighted score is frame 1, but |1-0| < min_diff 2;
        # next candidate 3 respects spacing
        scores = [0.7, 0.9, 0.1, 0.6]
        brightness = [0.5, 0.9, 0.9, 0.9]
        records, metrics = make(scores, brightness=brightness)
        groups = groups_of(4, 4)
        out = augment_lowlight_groups({0}, records, metrics, groups,
                                      min_diff=2)
        assert out == {0, 3}

    def test_zero_budget_is_noop(self):
        scores = [0.5, 0.6]
        records, metrics = make(scores)
        groups = groups_of(2, 2)
        out = augment_lowlight_groups({0}, records, metrics, groups,
                                      min_diff=1, keep_ratio=0.0,
                                      min_keep=0)
        assert out == {0}
