"""Instance separation: touching subjects must yield separate masks,
matching the per-detection granularity of the reference's Mask R-CNN
(gs360_SegmentationMaskTool.py:334-356)."""

import numpy as np

from gs360x.models import instances
from gs360x.models.segmentation import SegmentationPredictor, NUM_CLASSES, \
    CLASS_TO_INDEX


def capsule(h, w, cy, cx, ry, rx):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0


class TestSplitInstances:
    def test_single_blob_passes_through(self):
        m = capsule(96, 96, 48, 48, 30, 12)
        labels, count = instances.split_instances(m)
        assert count == 1
        np.testing.assert_array_equal(labels > 0, m)

    def test_two_touching_capsules_split(self):
        # two vertical "people" side by side, silhouettes touching at a
        # thin waist (shoulder contact), not a fat overlap
        m = capsule(128, 128, 64, 50, 42, 14) | capsule(128, 128, 64, 77,
                                                        42, 14)
        labels, count = instances.split_instances(m)
        assert count == 2
        # each piece should be roughly half the union
        a1 = (labels == 1).sum()
        a2 = (labels == 2).sum()
        total = m.sum()
        assert a1 + a2 == total            # every pixel assigned
        assert min(a1, a2) > 0.3 * total

    def test_separate_blobs_are_separate(self):
        m = capsule(96, 96, 30, 20, 12, 8) | capsule(96, 96, 70, 70, 12, 8)
        _, count = instances.split_instances(m)
        assert count == 2

    def test_tiny_specks_ignored(self):
        m = np.zeros((64, 64), bool)
        m[10, 10] = True                   # below min_area
        _, count = instances.split_instances(m)
        assert count == 0


class TestDetectorInstanceContract:
    def test_two_adjacent_people_yield_two_masks(self, monkeypatch):
        """The reference emits one mask per DETECTION; adjacent people
        with touching silhouettes must not merge into one instance."""
        h = w = 128
        person = CLASS_TO_INDEX["person"]
        m = capsule(h, w, 70, 50, 40, 13) | capsule(h, w, 70, 75, 40, 13)
        probs = np.zeros((h, w, NUM_CLASSES), np.float32)
        probs[..., 0] = 1.0
        probs[m, 0] = 0.1
        probs[m, person] = 0.9

        pred = SegmentationPredictor.__new__(SegmentationPredictor)
        monkeypatch.setattr(pred, "class_probabilities",
                            lambda rgb: probs, raising=False)
        dets = pred.detect(np.zeros((h, w, 3), np.float32), ["person"])
        assert len(dets) == 2
        assert all(d["score"] >= 0.7 for d in dets)
        union = np.zeros((h, w), bool)
        for d in dets:
            union |= d["mask"]
        np.testing.assert_array_equal(union, m)
