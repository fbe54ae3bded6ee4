import numpy as np

from cfear_radarodometry_code_public_tpu.utils import native_io


def _frames(n, a=64, r=128, seed=0):
    rng = np.random.default_rng(seed)
    return [(i * 0.25, rng.integers(0, 255, (a, r), dtype=np.uint8))
            for i in range(n)]


def test_native_lib_builds():
    assert native_io.native_available(), \
        "g++ toolchain present but native lib failed to build"


def test_pack_roundtrip(tmp_path):
    path = str(tmp_path / "seq.rpk")
    frames = _frames(10)
    native_io.pack_frames(path, iter(frames), len(frames))
    pack = native_io.RadarPack(path)
    assert (pack.n_frames, pack.n_azimuths, pack.n_bins) == (10, 64, 128)
    for i in (0, 5, 9):
        stamp, img = pack.read(i)
        assert abs(stamp - frames[i][0]) < 1e-6
        np.testing.assert_array_equal(img, frames[i][1])
    pack.close()


def test_prefetch_loader_streams_all(tmp_path):
    path = str(tmp_path / "seq.rpk")
    frames = _frames(23, seed=1)
    native_io.pack_frames(path, iter(frames), len(frames))
    pack = native_io.RadarPack(path)
    loader = native_io.PrefetchLoader(pack, batch=8, depth=2)
    got = []
    while True:
        nxt = loader.next()
        if nxt is None:
            break
        data, stamps, first = nxt
        assert first == len(got)
        got.extend(list(data))
    assert len(got) == 23
    np.testing.assert_array_equal(got[22], frames[22][1])
    np.testing.assert_array_equal(got[0], frames[0][1])
    loader.close()
    pack.close()


def test_loader_loop_mode(tmp_path):
    path = str(tmp_path / "seq.rpk")
    frames = _frames(4, seed=2)
    native_io.pack_frames(path, iter(frames), len(frames))
    pack = native_io.RadarPack(path)
    loader = native_io.PrefetchLoader(pack, batch=4, depth=2, loop=True)
    for _ in range(3):           # endless stream keeps producing
        nxt = loader.next()
        assert nxt is not None
        assert nxt[0].shape[0] == 4
    loader.close()
    pack.close()
