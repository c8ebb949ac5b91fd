"""Manual mask editor: paint model, undo, layer naming, maskseg merge."""

import numpy as np

from gs360x.gui import maskedit


class TestMaskCanvas:
    def test_stroke_paints_disk(self):
        c = maskedit.MaskCanvas(64, 64)
        c.stroke(32, 32, 10)
        assert c.mask[32, 32] == 255
        assert c.mask[32, 41] == 255
        assert c.mask[32, 44] == 0
        assert c.painted_pixels() > 250

    def test_erase(self):
        c = maskedit.MaskCanvas(64, 64)
        c.stroke(32, 32, 10)
        c.stroke(32, 32, 5, erase=True)
        assert c.mask[32, 32] == 0
        assert c.mask[32, 41] == 255

    def test_line_gapless(self):
        c = maskedit.MaskCanvas(64, 64)
        c.line(10, 5, 10, 60, 3)
        assert (c.mask[10, 5:60] == 255).all()

    def test_undo_restores(self):
        c = maskedit.MaskCanvas(32, 32)
        c.stroke(10, 10, 4)
        n = c.painted_pixels()
        c.stroke(20, 20, 4)
        assert c.undo()
        assert c.painted_pixels() == n
        assert c.undo()
        assert c.painted_pixels() == 0
        assert not c.undo()

    def test_clear_undoable(self):
        c = maskedit.MaskCanvas(32, 32)
        c.stroke(10, 10, 4)
        c.clear()
        assert c.painted_pixels() == 0
        c.undo()
        assert c.painted_pixels() > 0

    def test_edge_stroke_clipped(self):
        c = maskedit.MaskCanvas(32, 32)
        c.stroke(0, 0, 10)
        c.stroke(31, 31, 10)
        assert c.mask[0, 0] == 255 and c.mask[31, 31] == 255

    def test_overlay_blends(self):
        c = maskedit.MaskCanvas(8, 8)
        c.stroke(4, 4, 2)
        img = np.zeros((8, 8, 3), np.uint8)
        out = c.overlay_rgb(img)
        assert out[4, 4, 0] > 80 and out[0, 0, 0] == 0


class TestLayers:
    def test_layer_path_multicam_shared(self, tmp_path):
        a = maskedit.layer_path_for_image(tmp_path, "frame_0001_B.png")
        b = maskedit.layer_path_for_image(tmp_path, "frame_0099_B.png")
        assert a == b == tmp_path / "view__B__add.png"
        c = maskedit.layer_path_for_image(tmp_path, "random.png")
        assert c.name == "file__random__add.png"

    def test_save_load_roundtrip(self, tmp_path):
        c = maskedit.MaskCanvas(40, 60)
        c.stroke(20, 30, 8)
        out = maskedit.save_layer(c, tmp_path, "img_0001_A.png")
        assert out.exists()
        back = maskedit.load_layer(tmp_path, "img_0002_A.png", (40, 60))
        assert back is not None
        np.testing.assert_array_equal(back.mask, c.mask)

    def test_load_missing_returns_none(self, tmp_path):
        assert maskedit.load_layer(tmp_path, "img_A.png", (10, 10)) is None

    def test_maskseg_merges_layer(self, tmp_path):
        """A painted layer flows into maskseg's manual merge path."""
        from gs360x.io.image import write_image
        from gs360x.tools.maskseg import load_manual_add_layer

        c = maskedit.MaskCanvas(48, 48)
        c.stroke(24, 24, 6)
        maskedit.save_layer(c, tmp_path / "manual", "shot_0001_C.png")
        img_path = tmp_path / "shot_0001_C.png"
        write_image(img_path, np.zeros((48, 48, 3), np.uint8))
        merged = load_manual_add_layer(img_path, tmp_path / "manual",
                                       (48, 48))
        assert merged is not None
        assert merged[24, 24] == 255
