"""Tiling stage: native slide reader, edge filter, XML labels, and the
CAMELYON16 tiler CLI end-to-end on a synthetic pyramidal TIFF."""

import os

import numpy as np
import pytest

from snuffy_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def make_slide(path, size=1024, tissue_box=(256, 768)):
    """Level-0 slide: white background, textured 'tissue' block."""
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = np.full((size, size, 3), 245, np.uint8)
    a, b = tissue_box
    arr[a:b, a:b] = (rng.random((b - a, b - a, 3)) * 180 + 40).astype(np.uint8)
    im0 = Image.fromarray(arr)
    im1 = im0.resize((size // 2, size // 2))
    im0.save(path, save_all=True, append_images=[im1])
    return arr


def write_xml(path, polygon):
    rows = "".join(
        f'<Coordinate Order="{i}" X="{x}" Y="{y}"/>'
        for i, (x, y) in enumerate(polygon)
    )
    xml = (
        "<ASAP_Annotations><Annotations>"
        f'<Annotation Name="_0" Type="Polygon" PartOfGroup="Tumor">'
        f"<Coordinates>{rows}</Coordinates></Annotation>"
        "</Annotations></ASAP_Annotations>"
    )
    with open(path, "w") as f:
        f.write(xml)


def test_edge_energy_separates_tissue_from_background():
    from snuffy_tpu.tiling.deepzoom import edge_energy

    rng = np.random.default_rng(0)
    background = np.full((64, 64, 3), 245, np.uint8)
    tissue = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert edge_energy(background) < 1.0
    assert edge_energy(tissue) > 20.0


def test_tile_slide_with_labels(tmp_path):
    from snuffy_tpu.tiling.deepzoom import TilerConfig, tile_slide

    slide_path = str(tmp_path / "tumor_001.tif")
    make_slide(slide_path)
    xml_path = str(tmp_path / "tumor_001.xml")
    # tumor polygon well inside tile (1,1) — ends at 450 so it does not
    # touch the x=512 tile boundary (the reference's shapely `intersects`
    # counts boundary touches as tumor; so does the rasterized overlap)
    write_xml(xml_path, [(256, 256), (450, 256), (450, 450), (256, 450)])

    cfg = TilerConfig(
        tile_size=256, objective_power=20, base_mag=20,
        background_threshold=5.0, workers=0, name_with_level=True,
    )
    out = str(tmp_path / "out")
    kept = tile_slide(slide_path, out, cfg, annotation_xml=xml_path)
    # tissue spans rows/cols 1..2 of the 4×4 grid; background tiles dropped
    names = sorted(os.listdir(out))
    assert len(names) == len(kept)
    assert all(n.endswith(".jpeg") and "-" in n for n in names)
    labels = {(c, r): lab for c, r, lab in kept}
    assert labels[(1, 1)] == 1        # inside the tumor polygon
    assert labels.get((2, 2), 0) == 0  # tissue, clearly outside the polygon
    assert (0, 0) not in labels        # background filtered

    from snuffy_tpu.tiling.deepzoom import append_tile_labels

    csv = str(tmp_path / "tile_label.csv")
    append_tile_labels(csv, "tumor_001", kept)
    lines = open(csv).read().strip().splitlines()
    assert f"tumor_001_1_1,1" in lines


def test_magnification_downsampling(tmp_path):
    """objective 40 → base 20 must read at downsample 2 (level 1 here)."""
    from snuffy_tpu.native import NativeSlide
    from snuffy_tpu.tiling.deepzoom import pick_read_level

    slide_path = str(tmp_path / "s.tif")
    make_slide(slide_path)
    s = NativeSlide(slide_path)
    level, residual = pick_read_level(s, target_downsample=2.0)
    assert level == 1 and residual == pytest.approx(1.0)
    level0, residual0 = pick_read_level(s, target_downsample=1.0)
    assert level0 == 0 and residual0 == pytest.approx(1.0)
    s.close()


def test_camelyon16_tiler_cli(tmp_path, monkeypatch):
    import deepzoom_tiler_camelyon16 as cli

    base = tmp_path / "datasets" / "camelyon16"
    (base / "0_normal").mkdir(parents=True)
    (base / "1_tumor").mkdir(parents=True)
    (base / "annotations").mkdir()
    make_slide(str(base / "1_tumor" / "tumor_001.tif"))
    make_slide(str(base / "0_normal" / "normal_001.tif"))
    write_xml(str(base / "annotations" / "tumor_001.xml"),
              [(256, 256), (450, 256), (450, 450), (256, 450)])

    cli.main([
        "-j", "0", "-t", "5", "-o", "20", "-b", "20",
        "--datasets_path", str(tmp_path / "datasets"),
    ])
    single = base / "single"
    assert (single / "1_tumor" / "tumor_001").is_dir()
    assert (single / "0_normal" / "normal_001").is_dir()
    assert (base / "tile_label.csv").exists()
    content = open(base / "tile_label.csv").read()
    assert "tumor_001_1_1,1" in content


def test_dz_level_naming_uses_max_dimension(tmp_path):
    """The `-{level}` filename suffix must follow DeepZoomGenerator's
    level_count = 1 + ceil(log2(max(w, h))) — for tall slides (h > w) the
    level is set by the HEIGHT (reference
    deepzoom_tiler_camelyon16.py:152,219-224)."""
    from PIL import Image

    from snuffy_tpu.tiling.deepzoom import TilerConfig, tile_slide

    rng = np.random.default_rng(1)
    w, h = 512, 1400  # tall: ceil(log2(1400)) = 11, ceil(log2(512)) = 9
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    im0 = Image.fromarray(arr)
    slide_path = str(tmp_path / "tall.tif")
    im0.save(slide_path, save_all=True,
             append_images=[im0.resize((w // 2, h // 2))])

    out = str(tmp_path / "tiles")
    cfg = TilerConfig(tile_size=256, objective_power=40.0, base_mag=20.0,
                      background_threshold=1.0, workers=0,
                      name_with_level=True)
    tile_slide(slide_path, out, cfg)
    names = os.listdir(out)
    assert names, "tiler produced no tiles"
    # target downsample 2 → dz level = ceil(log2(1400)) − 1 = 10
    assert all(n.endswith("-10.jpeg") for n in names), names[:4]


def test_tile_overlap_and_png_format(tmp_path):
    """`-e/--overlap` and `-f/--format` are honored (reference
    deepzoom_tiler_camelyon16.py:305: overlap rides into DeepZoomGenerator):
    interior tiles gain `overlap` px per shared edge; png encodes via PIL."""
    from PIL import Image

    from snuffy_tpu.tiling.deepzoom import TilerConfig, tile_slide

    slide_path = str(tmp_path / "s.tif")
    make_slide(slide_path)  # 1024² with a textured block at 256..768
    cfg = TilerConfig(
        tile_size=256, objective_power=20, base_mag=20,
        background_threshold=5.0, workers=0, name_with_level=False,
        overlap=16, image_format="png",
    )
    out = str(tmp_path / "out")
    tile_slide(slide_path, out, cfg)
    names = sorted(os.listdir(out))
    assert names and all(n.endswith(".png") for n in names)
    sizes = {}
    for n in names:
        c, r = (int(x) for x in n.split(".")[0].split("_"))
        sizes[(c, r)] = Image.open(os.path.join(out, n)).size
    # interior tile (1,1): +16 px on all four sides of the 4×4 grid
    assert sizes[(1, 1)] == (256 + 32, 256 + 32)
    # tiles adjacent to the border extend only on interior edges
    for (c, r), (w, h) in sizes.items():
        assert w == 256 + (16 if c > 0 else 0) + (16 if c < 3 else 0)
        assert h == 256 + (16 if r > 0 else 0) + (16 if r < 3 else 0)


def test_overlap_zero_unchanged(tmp_path):
    """overlap=0 must be byte-identical to the pre-overlap tiler."""
    from PIL import Image

    from snuffy_tpu.tiling.deepzoom import TilerConfig, tile_slide

    slide_path = str(tmp_path / "s.tif")
    make_slide(slide_path)
    cfg = TilerConfig(tile_size=256, objective_power=20, base_mag=20,
                      background_threshold=5.0, workers=0,
                      name_with_level=False)
    out = str(tmp_path / "out")
    tile_slide(slide_path, out, cfg)
    for n in os.listdir(out):
        assert Image.open(os.path.join(out, n)).size == (256, 256)


def test_nested_two_level_pyramid(tmp_path):
    """2-magnification nested-bag mode (reference
    deepzoom_tiler_camelyon16.py:256-295 intent): low-mag patches at the bag
    root, each owning a folder of the high-mag patches it covers."""
    from snuffy_tpu.tiling.deepzoom import TilerConfig, tile_slide_nested

    slide_path = str(tmp_path / "s.tif")
    make_slide(slide_path)
    cfg = TilerConfig(tile_size=256, objective_power=20, base_mag=20,
                      background_threshold=5.0, workers=0,
                      name_with_level=True)
    out = str(tmp_path / "bag")
    kept_hi = tile_slide_nested(slide_path, out, cfg, mag_levels=(0, 1))
    files = sorted(os.listdir(out))
    low = [f for f in files if os.path.isfile(os.path.join(out, f))]
    subs = [f for f in files if os.path.isdir(os.path.join(out, f))]
    assert low and subs
    # every subfolder is named after a low patch stem and holds ≤ 4 tiles
    low_stems = {f.split(".")[0] for f in low}
    for s in subs:
        assert s in low_stems
        inside = os.listdir(os.path.join(out, s))
        assert 1 <= len(inside) <= 4
        # high patches of low (c, r) have cols/rows in [2c, 2c+2)
        c, r = (int(x) for x in s.split("-")[0].split("_"))
        for f in inside:
            hc, hr = (int(x) for x in f.split(".")[0].split("-")[0].split("_"))
            assert hc // 2 == c and hr // 2 == r
    assert kept_hi  # finest-level tuples feed tile_label.csv


def test_native_edge_energy_bit_compatible_with_cv2():
    """The C grid reader's per-tile energy must equal the Python tiler's
    cv2 filter EXACTLY (fixed-point RGB2GRAY + f32 Laplacian on integer
    grays is exact arithmetic both sides) — otherwise borderline tiles
    classify differently between the fused pipeline and the tiler that
    built the training bags."""
    import tempfile

    from snuffy_tpu import native
    from snuffy_tpu.tiling.deepzoom import edge_energy

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    tiles = [
        rng.integers(0, 256, (64, 64, 3), np.uint8),            # strong
        np.full((64, 64, 3), 200, np.uint8),                    # flat
        (rng.integers(0, 8, (64, 64, 3)) + 120).astype(np.uint8),  # faint
        rng.integers(100, 140, (64, 64, 3)).astype(np.uint8),   # borderline
    ]
    level0 = np.zeros((128, 128, 3), np.uint8)
    level0[:64, :64] = tiles[0]
    level0[:64, 64:] = tiles[1]
    level0[64:, :64] = tiles[2]
    level0[64:, 64:] = tiles[3]
    path = tempfile.mktemp(suffix=".tif")
    native.write_tiled_tiff(path, [level0], tile=64, jpeg_quality=100)
    slide = native.NativeSlide(path)
    grid, energy = slide.read_grid(0, 64, 2, 2, 0)
    slide.close()
    os.remove(path)
    for i in range(4):
        assert abs(float(energy[i]) - edge_energy(grid[i])) < 1e-4


def test_nested_pyramid_drops_orphan_high_tiles(tmp_path, monkeypatch):
    """High-mag tiles whose low-mag parent was background-filtered never
    leave the temp dir — they must NOT appear in the returned kept tuples
    (which feed tile_label.csv) or rows would reference deleted files."""
    from snuffy_tpu.tiling import deepzoom as dz

    def fake_tile_slide(slide_path, out_dir, cfg, annotation_xml=None,
                        mag_level=0):
        os.makedirs(out_dir, exist_ok=True)
        if mag_level == 0:  # high mag: parent of (5,5) is (2,2), NOT kept
            kept = [(0, 0, 1), (0, 1, 0), (5, 5, 1)]
            for c, r, _ in kept:
                open(os.path.join(out_dir, f"{c}_{r}-0.jpeg"), "w").close()
            return kept
        open(os.path.join(out_dir, "0_0-1.jpeg"), "w").close()
        return [(0, 0, None)]  # low mag keeps only (0,0)

    monkeypatch.setattr(dz, "tile_slide", fake_tile_slide)
    out = str(tmp_path / "bag")
    kept_hi = dz.tile_slide_nested(
        "unused.tif", out, dz.TilerConfig(workers=0), mag_levels=(0, 1)
    )
    assert kept_hi == [(0, 0, 1), (0, 1, 0)]  # orphan (5,5) dropped
    moved = sorted(os.listdir(os.path.join(out, "0_0-1")))
    assert moved == ["0_0-0.jpeg", "0_1-0.jpeg"]
    # and the orphan file is gone with the temp dir
    assert not any("5_5" in f for _, _, fs in os.walk(out) for f in fs)
