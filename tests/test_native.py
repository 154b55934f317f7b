"""Native C++ fastload: npy parse + batched decode/resize vs numpy/Python."""

import numpy as np
import pytest

from vision_mtl_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def test_read_npy_roundtrip(tmp_path, rng):
    for dtype in (np.float32, np.float64, np.int64, np.uint8):
        arr = (rng.uniform(0, 100, size=(7, 9, 3))).astype(dtype)
        p = tmp_path / f"a_{np.dtype(dtype).name}.npy"
        np.save(p, arr)
        got = native.read_npy(str(p))
        np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-6)


def test_load_cityscapes_batch(tmp_path, rng):
    b, h, w = 3, 32, 48
    oh, ow = 16, 24
    img_paths, mask_paths, depth_paths = [], [], []
    imgs, masks, depths = [], [], []
    for i in range(b):
        img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
        mask = rng.integers(-1, 19, size=(h, w)).astype(np.int64)
        depth = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
        for name, arr, acc in (
            ("img", img, img_paths),
            ("mask", mask, mask_paths),
            ("depth", depth, depth_paths),
        ):
            p = tmp_path / f"{name}_{i}.npy"
            np.save(p, arr)
            acc.append(str(p))
        imgs.append(img)
        masks.append(mask)
        depths.append(depth)

    batch = native.load_cityscapes_batch(
        img_paths, mask_paths, depth_paths, oh, ow, num_threads=2
    )
    assert batch["img"].shape == (b, oh, ow, 3)
    assert batch["mask"].shape == (b, oh, ow)
    assert batch["depth"].shape == (b, oh, ow, 1)
    assert batch["mask"].dtype == np.int32

    # nearest-resize mask must contain only remapped values (no -1)
    assert batch["mask"].min() >= 0
    assert batch["mask"].max() <= 18
    # -1 got remapped to 18 at the right positions: nearest of (2y, 2x)
    ref_mask = masks[0][::2, ::2].copy()
    ref_mask[ref_mask == -1] = 18
    np.testing.assert_array_equal(batch["mask"][0], ref_mask)
    # depth nearest + identity scale
    np.testing.assert_allclose(
        batch["depth"][0, ..., 0], depths[0][::2, ::2], rtol=1e-6
    )


def test_identity_resize_exact(tmp_path, rng):
    # size-matched f32 img / int64 mask / f32 depth hit the direct-fread fast
    # paths; remap and depth scaling must still be fused in exactly
    h, w = 8, 10
    img = rng.uniform(size=(h, w, 3)).astype(np.float32)
    mask = rng.integers(-1, 5, size=(h, w)).astype(np.int64)
    mask[0, 0] = -1
    depth = rng.uniform(size=(h, w)).astype(np.float32)
    paths = {}
    for name, arr in (("img", img), ("mask", mask), ("depth", depth)):
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)
    batch = native.load_cityscapes_batch(
        [paths["img"]], [paths["mask"]], [paths["depth"]], h, w, depth_div=2.0
    )
    np.testing.assert_allclose(batch["img"][0], img, rtol=1e-6)
    ref_mask = mask.astype(np.int32)
    ref_mask[ref_mask == -1] = 18
    np.testing.assert_array_equal(batch["mask"][0], ref_mask)
    np.testing.assert_allclose(
        batch["depth"][0, ..., 0], depth / 2.0, rtol=1e-6
    )


def test_missing_file_reports_index(tmp_path, rng):
    img = rng.uniform(size=(4, 4, 3)).astype(np.float32)
    p = tmp_path / "img.npy"
    np.save(p, img)
    with pytest.raises(RuntimeError, match="sample 0"):
        native.load_cityscapes_batch(
            ["/nonexistent.npy"], [str(p)], [str(p)], 4, 4
        )


def test_read_png_matches_pil(tmp_path, rng):
    from PIL import Image

    # 8-bit RGB
    rgb = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    p1 = tmp_path / "rgb.png"
    Image.fromarray(rgb).save(p1)
    got = native.read_png(str(p1))
    np.testing.assert_array_equal(got, rgb.astype(np.float32))

    # 8-bit grayscale (seg13 labels)
    gray = rng.integers(0, 14, size=(37, 53)).astype(np.uint8)
    p2 = tmp_path / "gray.png"
    Image.fromarray(gray).save(p2)
    got = native.read_png(str(p2))
    np.testing.assert_array_equal(got, gray.astype(np.float32))

    # 16-bit grayscale (depth, meters*1e4)
    d16 = rng.integers(0, 65535, size=(37, 53)).astype(np.uint16)
    p3 = tmp_path / "d16.png"
    Image.fromarray(d16).save(p3)
    got = native.read_png(str(p3))
    np.testing.assert_array_equal(got, d16.astype(np.float32))


def test_read_png_missing_file():
    with pytest.raises(RuntimeError, match="decode failed"):
        native.read_png("/nonexistent.png")


def _npy_v1(header_body: bytes) -> bytes:
    return (
        b"\x93NUMPY\x01\x00"
        + len(header_body).to_bytes(2, "little")
        + header_body
    )


def test_npy_header_fuzz_no_crash(tmp_path, rng):
    """Hostile/corrupt npy files must raise cleanly — never abort the
    process (uncaught C++ exceptions across the ctypes ABI call
    std::terminate) and never attempt attacker-controlled allocations."""
    p = tmp_path / "fuzz.npy"

    # pure random bytes (seeded): essentially never a valid header
    for _ in range(150):
        p.write_bytes(rng.bytes(int(rng.integers(0, 200))))
        with pytest.raises(RuntimeError):
            native.read_npy(str(p))

    # every truncation of a real file fails cleanly (header or payload cut)
    real_arr = rng.uniform(size=(6, 5)).astype(np.float32)
    real_path = tmp_path / "real.npy"
    np.save(real_path, real_arr)
    real = real_path.read_bytes()
    for cut in range(0, len(real) - 1, 3):
        p.write_bytes(real[:cut])
        with pytest.raises(RuntimeError):
            native.read_npy(str(p))

    # forged v2 header_len near 4 GiB: must be rejected by the header cap,
    # not allocated (bad_alloc would kill the process)
    p.write_bytes(b"\x93NUMPY\x02\x00" + (0xFFFFFFF0).to_bytes(4, "little"))
    with pytest.raises(RuntimeError):
        native.read_npy(str(p))

    # hostile headers: absurd shapes, overflow-bait, zero/negative dims,
    # garbage descr, missing keys — all validated before any payload work
    hostile = [
        b"{'descr': '<f4', 'fortran_order': False, 'shape': (99999999999,), }",
        b"{'descr': '<f4', 'fortran_order': False, "
        b"'shape': (4294967296, 4294967296), }",
        # decoded-f32 expansion bait: 1.9 GiB of int8 -> would be 7.6 GiB f32
        b"{'descr': '|i1', 'fortran_order': False, 'shape': (2000000000,), }",
        b"{'descr': '<f4', 'fortran_order': False, 'shape': (0,), }",
        b"{'descr': '<f4', 'fortran_order': False, 'shape': (-3, 5), }",
        b"{'descr': '<f4', 'fortran_order': False, 'shape': }",
        b"{'descr': '', 'fortran_order': False, 'shape': (2, 2), }",
        b"{'descr': '<f999', 'fortran_order': False, 'shape': (2, 2), }",
        b"{'descr': '>f4', 'fortran_order': False, 'shape': (2, 2), }",
        b"{'fortran_order': False, 'shape': (2, 2), }",
        b"{'descr': '<f4', 'fortran_order': True, 'shape': (2, 2), }",
        b"{",
        b"",
    ]
    for body in hostile:
        p.write_bytes(_npy_v1(body))
        with pytest.raises(RuntimeError):
            native.read_npy(str(p))

    # the parser still works after all that
    np.testing.assert_allclose(native.read_npy(str(real_path)), real_arr)


def test_png_fuzz_no_crash(tmp_path, rng):
    """Hostile/corrupt PNGs: forged IHDR dimensions must be rejected before
    buffer sizing (size_t overflow would under-allocate, then the unfilter
    loop writes out of bounds); mutations/truncations never crash."""
    import struct

    from PIL import Image

    p = tmp_path / "fuzz.png"
    magic = b"\x89PNG\r\n\x1a\n"

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload)) + typ + payload + b"\0\0\0\0"

    # forged IHDR dimension grid, incl. the size_t-overflow baits
    for w, h in [
        (2**31 - 1, 2**31 - 1),
        (2**24 + 1, 1),
        (1, 2**24 + 1),
        (2**20, 2**20),
        (0, 10),
        (10, 0),
    ]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        p.write_bytes(magic + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
        with pytest.raises(RuntimeError):
            native.read_png(str(p))

    # a real PNG: every prefix truncation either fails cleanly or — when the
    # cut only drops bytes past the complete IDAT (e.g. the IEND chunk) —
    # still decodes to exactly the right pixels
    rgb = rng.integers(0, 255, size=(9, 11, 3), dtype=np.uint8)
    real_path = tmp_path / "real.png"
    Image.fromarray(rgb).save(real_path)
    real = bytearray(real_path.read_bytes())
    for cut in range(0, len(real) - 1, 5):
        p.write_bytes(bytes(real[:cut]))
        try:
            out = native.read_png(str(p))
        except RuntimeError:
            continue
        np.testing.assert_array_equal(out, rgb.astype(np.float32))

    # random single-byte mutations: decode may fail OR succeed with altered
    # pixels — either way no crash, and any success has sane bounds
    for _ in range(150):
        mutated = bytearray(real)
        pos = int(rng.integers(0, len(mutated)))
        mutated[pos] = int(rng.integers(0, 256))
        p.write_bytes(bytes(mutated))
        try:
            out = native.read_png(str(p))
            assert out.size <= 2**24
        except RuntimeError:
            pass

    # random garbage behind the magic
    for _ in range(100):
        p.write_bytes(magic + rng.bytes(int(rng.integers(0, 120))))
        with pytest.raises(RuntimeError):
            native.read_png(str(p))

    np.testing.assert_array_equal(
        native.read_png(str(real_path)), rgb.astype(np.float32)
    )


def test_corrupt_int64_label_fails_sample(tmp_path, rng):
    """A label outside int32 range (e.g. 2^32-1, which would silently wrap
    to -1 and get remapped as the ignore value) fails the sample instead of
    producing wrong data."""
    if not native.available():
        pytest.skip("native lib unavailable")
    h, w = 8, 8
    img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
    mask = rng.integers(0, 19, size=(h, w)).astype(np.int64)
    mask[3, 3] = 2**32 - 1  # wraps to -1 under a blind (int32) cast
    depth = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
    paths = {}
    for name, arr in (("img", img), ("mask", mask), ("depth", depth)):
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)
    with pytest.raises(RuntimeError, match="sample 0"):
        native.load_cityscapes_batch(
            [paths["img"]], [paths["mask"]], [paths["depth"]], h, w,
            num_threads=1,
        )
