"""IO plugin tests: real vendor files from the reference's data dir
where available, synthetic files (mirroring the reference's
_dummy_files strategy, /root/reference/src/kikuchipy/data/_dummy_files/)
otherwise."""

from pathlib import Path

import h5py
import numpy as np
import pytest

import kikuchipy_tpu as kp
from kikuchipy_tpu.io._io import plugins

DATA = Path("/root/reference/src/kikuchipy/data")

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference data files not available"
)


class TestLoadDispatch:
    def test_plugins_registry(self):
        p = plugins()
        assert p["kikuchipy_h5ebsd"]["writes"]
        assert not p["oxford_binary"]["writes"]
        assert len(p) == 13

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            kp.load("/nonexistent/file.h5")

    def test_unknown_extension(self, tmp_path):
        f = tmp_path / "x.xyz"
        f.write_text("")
        with pytest.raises(IOError, match="Could not read"):
            kp.load(f)


class TestKikuchipyH5EBSD:
    def test_load(self):
        s = kp.load(DATA / "kikuchipy_h5ebsd/patterns.h5")
        assert s.navigation_shape == (3, 3)
        assert s.signal_shape == (60, 60)
        assert s.xmap is not None

    def test_load_second_scan(self):
        s = kp.load(DATA / "kikuchipy_h5ebsd/patterns.h5", scan_group_names="Scan 2")
        assert s.navigation_shape == (3, 3)

    def test_load_multiple(self):
        scans = kp.load(
            DATA / "kikuchipy_h5ebsd/patterns.h5",
            scan_group_names=["Scan 1", "Scan 2"],
        )
        assert len(scans) == 2

    def test_bad_scan_name(self):
        with pytest.raises(IOError, match="not in"):
            kp.load(DATA / "kikuchipy_h5ebsd/patterns.h5", scan_group_names="Scan 9")

    def test_write_add_scan(self, tmp_path):
        s = kp.load(DATA / "kikuchipy_h5ebsd/patterns.h5")
        f = tmp_path / "out.h5"
        s.save(f)
        kp.save(f, s, scan_number=2, add_scan=True)
        scans = kp.load(f, scan_group_names=["Scan 1", "Scan 2"])
        np.testing.assert_array_equal(
            np.asarray(scans[0].data), np.asarray(scans[1].data)
        )
        with pytest.raises(IOError, match="already exists"):
            kp.save(f, s, scan_number=1, add_scan=True)


class TestNordif:
    def test_load(self):
        s = kp.load(DATA / "nordif/Pattern.dat")
        assert s.navigation_shape == (3, 3)
        assert s.signal_shape == (60, 60)
        assert s.static_background is not None
        assert s.detector.sample_tilt == 70.0
        assert s.metadata["beam_energy"] == 20.0
        assert s.metadata["microscope"] == "Hitachi SU-6600"

    def test_write_roundtrip(self, tmp_path):
        s = kp.load(DATA / "nordif/Pattern.dat")
        out = tmp_path / "Pattern.dat"
        s.save(out)
        s2 = kp.load(
            out, scan_size=(3, 3), pattern_size=(60, 60),
            setting_file=DATA / "nordif/Setting.txt",
        )
        np.testing.assert_array_equal(np.asarray(s2.data), np.asarray(s.data))

    def test_no_settings_raises(self, tmp_path):
        f = tmp_path / "naked.dat"
        np.zeros(100, np.uint8).tofile(f)
        with pytest.raises(ValueError, match="No setting file"):
            kp.load(f)

    def test_calibration_patterns(self):
        from kikuchipy_tpu.io.plugins.nordif_calibration_patterns import (
            file_reader,
        )

        s = file_reader(DATA / "nordif/Setting.txt")
        assert s.data.ndim == 3
        assert s.data.shape[0] == 2
        assert len(s.metadata["calibration_coordinates"]) == 2


class TestEdaxBinary:
    def test_up1(self):
        s = kp.load(DATA / "edax_binary/edax_binary.up1")
        assert s.data.dtype == np.uint8
        assert s.signal_shape == (60, 60)

    def test_up2(self):
        with pytest.warns(UserWarning, match="hexagonal"):
            s = kp.load(DATA / "edax_binary/edax_binary.up2")
        assert s.data.dtype == np.uint16


class TestOxfordBinary:
    def test_load(self):
        s = kp.load(DATA / "oxford_binary/patterns.ebsp")
        assert s.navigation_shape == (3, 3)
        assert s.signal_shape == (60, 60)
        assert s.metadata["step_x"] == 1.5

    def test_patterns_sorted_into_map_order(self):
        # The shipped file stores the first map pattern last; a correct
        # reader must undo that. kikuchipy's own h5 file holds the same
        # scan, so the two must agree per-pattern.
        s_ebsp = kp.load(DATA / "oxford_binary/patterns.ebsp")
        s_h5 = kp.load(DATA / "kikuchipy_h5ebsd/patterns.h5")
        np.testing.assert_array_equal(
            np.asarray(s_ebsp.data), np.asarray(s_h5.data)
        )


class TestEmsoftEBSD:
    def test_load(self):
        s = kp.load(DATA / "emsoft_ebsd/simulated_ebsd.h5")
        assert s.data.ndim >= 3
        assert s.xmap is not None
        assert s.xmap.size == s.navigation_size


class TestEmsoftMasterPatterns:
    def test_ebsd_master(self):
        mp = kp.load(
            DATA / "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5",
            projection="lambert",
            hemisphere="both",
        )
        assert mp.signal_shape == (401, 401)
        assert mp.phase.space_group == 225

    def test_stereographic_default(self):
        mp = kp.load(
            DATA / "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5"
        )
        assert mp.projection == "stereographic"
        assert mp.hemisphere == "upper"
        assert mp.data.ndim == 2

    def test_energy_selection(self):
        mp = kp.load(
            DATA / "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5",
            energy=20,
        )
        assert mp.energies.shape == (1,)

    def test_invalid_projection(self):
        with pytest.raises(ValueError, match="projection"):
            kp.load(
                DATA
                / "emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5",
                projection="gnomonic",
            )


class TestBrukerH5EBSD:
    @pytest.fixture
    def bruker_file(self, tmp_path, dummy_patterns, dummy_background):
        """Synthetic Bruker h5ebsd (mirrors reference
        data/_dummy_files/bruker_h5ebsd.py)."""
        f = tmp_path / "bruker.h5"
        with h5py.File(f, "w") as h:
            h["Manufacturer"] = np.array([b"Bruker Nano"])
            g = h.create_group("Scan 0/EBSD")
            hdr = g.create_group("Header")
            hdr["NROWS"] = np.array([3])
            hdr["NCOLS"] = np.array([3])
            hdr["PatternHeight"] = np.array([3])
            hdr["PatternWidth"] = np.array([3])
            hdr["PCX"] = np.array([0.45])
            hdr["PCY"] = np.array([0.6])
            hdr["DD"] = np.array([0.5])
            hdr["CameraTilt"] = np.array([2.5])
            hdr["Sample Tilt"] = np.array([69.0])
            hdr["XSTEP"] = np.array([1.5])
            hdr["YSTEP"] = np.array([1.5])
            hdr["StaticBackground"] = dummy_background
            g["Data/RawPatterns"] = dummy_patterns.reshape(9, 3, 3)
            sem = g.create_group("SEM")
            sem["KV"] = np.array([20.0])
        return f

    def test_load(self, bruker_file, dummy_patterns):
        s = kp.load(bruker_file)
        assert s.navigation_shape == (3, 3)
        np.testing.assert_array_equal(
            np.asarray(s.data), dummy_patterns
        )
        np.testing.assert_allclose(s.detector.pc, [[0.45, 0.6, 0.5]])
        assert s.detector.tilt == 2.5
        assert s.metadata["beam_energy"] == 20.0


class TestEdaxH5EBSD:
    def test_load(self):
        s = kp.load(DATA / "edax_h5ebsd/patterns.h5")
        assert s.navigation_shape == (3, 3)
        assert s.signal_shape == (60, 60)
        # The shipped file stores (0, 0, 0) in TSL convention, which is
        # (0, 1, 0) in Bruker's (y flipped).
        np.testing.assert_allclose(s.detector.pc, [[0.0, 1.0, 0.0]])


class TestOxfordH5EBSD:
    @pytest.fixture
    def h5oina_file(self, tmp_path, dummy_patterns):
        f = tmp_path / "scan.h5oina"
        with h5py.File(f, "w") as h:
            h["Format Version"] = np.array([b"5.0"])
            g = h.create_group("1/EBSD")
            hdr = g.create_group("Header")
            hdr["Y Cells"] = np.array([3])
            hdr["X Cells"] = np.array([3])
            hdr["Pattern Height"] = np.array([3])
            hdr["Pattern Width"] = np.array([3])
            hdr["X Step"] = np.array([0.5])
            hdr["Y Step"] = np.array([0.5])
            hdr["Tilt Angle"] = np.array([np.deg2rad(3.0)])
            hdr["Beam Voltage"] = np.array([20.0])
            g["Data/Processed Patterns"] = dummy_patterns.reshape(9, 3, 3)
            g["Data/Pattern Center X"] = np.full(9, 0.5)
            g["Data/Pattern Center Y"] = np.full(9, 0.3)
            g["Data/Detector Distance"] = np.full(9, 0.6)
        return f

    def test_load(self, h5oina_file, dummy_patterns):
        s = kp.load(h5oina_file)
        assert s.navigation_shape == (3, 3)
        np.testing.assert_array_equal(np.asarray(s.data), dummy_patterns)
        np.testing.assert_allclose(s.detector.tilt, 3.0)
        assert s.detector.navigation_shape == (3, 3)


class TestEBSDDirectory:
    def test_load_grid(self, tmp_path, dummy_patterns):
        from PIL import Image

        for y in range(3):
            for x in range(3):
                Image.fromarray(dummy_patterns[y, x]).save(
                    tmp_path / f"pattern_x{x}y{y}.tif"
                )
        s = kp.load(tmp_path)
        assert s.navigation_shape == (3, 3)
        np.testing.assert_array_equal(np.asarray(s.data), dummy_patterns)

    def test_load_flat(self, tmp_path, dummy_patterns):
        from PIL import Image

        for i in range(5):
            Image.fromarray(dummy_patterns[0, 0]).save(
                tmp_path / f"pat{i:03d}.png"
            )
        with pytest.warns(UserWarning, match="one navigation dimension"):
            s = kp.load(tmp_path)
        assert s.data.shape[0] == 5


class TestEmsoftECPTKDMasterPatterns:
    @pytest.fixture
    def ecp_file(self, tmp_path):
        """Synthetic EMsoft ECP master pattern file."""
        rng = np.random.default_rng(0)
        f = tmp_path / "ecp_master.h5"
        with h5py.File(f, "w") as h:
            g = h.create_group("EMData/ECPmaster")
            g["EkeV"] = np.array([20.0])
            g["mLPNH"] = rng.integers(0, 255, (1, 1, 101, 101)).astype(
                np.float32
            )
            g["mLPSH"] = g["mLPNH"][()]
            g["masterSPNH"] = rng.integers(0, 255, (1, 101, 101)).astype(
                np.float32
            )
            g["masterSPSH"] = g["masterSPNH"][()]
            g["xtalname"] = np.array([b"sic.xtal"])
            cd = h.create_group("CrystalData")
            cd["SpaceGroupNumber"] = np.array([186])
            cd["LatticeParameters"] = np.array(
                [0.307, 0.307, 1.008, 90, 90, 120]
            )
        return f

    def test_ecp_reader(self, ecp_file):
        s = kp.load(ecp_file, projection="lambert", hemisphere="both")
        from kikuchipy_tpu.signals.master_pattern import ECPMasterPattern

        assert isinstance(s, ECPMasterPattern)
        assert s.signal_shape == (101, 101)
        assert s.phase.name == "sic"
        assert s.phase.space_group == 186

    @pytest.fixture
    def tkd_file(self, tmp_path):
        rng = np.random.default_rng(1)
        f = tmp_path / "tkd_master.h5"
        with h5py.File(f, "w") as h:
            g = h.create_group("EMData/TKDmaster")
            g["EkeVs"] = np.array([10.0, 20.0])
            g["mLPNH"] = rng.integers(0, 255, (1, 2, 51, 51)).astype(np.float32)
            g["mLPSH"] = g["mLPNH"][()]
            g["masterSPNH"] = rng.integers(0, 255, (2, 51, 51)).astype(np.float32)
            g["masterSPSH"] = g["masterSPNH"][()]
            cd = h.create_group("CrystalData")
            cd["SpaceGroupNumber"] = np.array([225])
        return f

    def test_tkd_reader(self, tkd_file):
        s = kp.load(tkd_file, projection="lambert", hemisphere="both", energy=20)
        assert s.energies.shape == (1,)
        assert s.signal_shape == (51, 51)


class TestEdaxCrystalMap:
    def test_orientations_read(self):
        s = kp.load(DATA / "edax_h5ebsd/patterns.h5")
        assert s.xmap is not None
        assert s.xmap.size == 9
        assert "ci" in s.xmap.prop and "iq" in s.xmap.prop
        assert s.xmap.phases.names == ["Nickel"]


class TestSaveOverwriteSemantics:
    """Explicit overwrite decisions replace the reference's interactive
    prompt (io/_io.py:354)."""

    def test_existing_file_raises_then_overwrites(self, tmp_path):
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.signals.ebsd import EBSD

        s = EBSD(data=np.arange(81, dtype=np.uint8).reshape(1, 1, 9, 9))
        p = tmp_path / "scan.h5"
        s.save(p)
        with pytest.raises(FileExistsError, match="overwrite=True"):
            s.save(p)
        # overwrite=False: silently skipped (file unchanged).
        before = p.stat().st_mtime_ns
        s.save(p, overwrite=False)
        assert p.stat().st_mtime_ns == before
        s2 = EBSD(data=np.full((1, 1, 9, 9), 7, dtype=np.uint8))
        s2.save(p, overwrite=True)
        back = kp.load(p)
        assert np.all(np.asarray(back.data) == 7)


class TestOxfordBinaryV5:
    """Synthetic version-5 .ebsp: map_x/map_y header fields, one extra
    byte before the position table, out-of-order storage (the reference
    ships no v5 file; layout per oxford_binary/_api.py:72-585)."""

    @pytest.fixture
    def ebsp_v5_file(self, tmp_path):
        import struct

        rng = np.random.default_rng(42)
        ny, nx, sy, sx = 3, 3, 60, 60
        n = ny * nx
        patterns = rng.integers(0, 255, (n, sy, sx), dtype=np.uint8)

        # Stored order: shuffled, but keep map pattern (0, 0) first so
        # its small (map_x, map_y) int64 does not look like a table jump
        # (same constraint the reference's dummy files satisfy).
        stored_order = [0, 4, 2, 8, 1, 7, 3, 5, 6]
        header_size = 6 * 4
        footer_size = 1 + 8 + 1 + 8
        bytes_per = header_size + sy * sx + footer_size
        first_pos = 9 + n * 8

        # pattern_starts[map_index] -> byte offset of that pattern
        starts = np.zeros(n, np.int64)
        for slot, map_idx in enumerate(stored_order):
            starts[map_idx] = first_pos + slot * bytes_per

        f = tmp_path / "v5.ebsp"
        with open(f, "wb") as fh:
            fh.write(struct.pack("<q", -5))
            fh.write(b"\x00")
            starts.tofile(fh)
            for map_idx in stored_order:
                my, mx = divmod(map_idx, nx)
                np.array(
                    [mx, my, 0, sy, sx, sy * sx], np.int32
                ).tofile(fh)
                patterns[map_idx].tofile(fh)
                fh.write(struct.pack("<?", True))
                fh.write(struct.pack("<d", mx * 2.0))
                fh.write(struct.pack("<?", True))
                fh.write(struct.pack("<d", my * 2.0))
        return f, patterns.reshape(ny, nx, sy, sx)

    def test_load_v5_out_of_order(self, ebsp_v5_file):
        path, expected = ebsp_v5_file
        s = kp.load(path)
        assert s.metadata["version"] == 5
        assert s.navigation_shape == (3, 3)
        assert s.metadata["step_x"] == 2.0
        np.testing.assert_array_equal(np.asarray(s.data), expected)


def _write_dummy_ebsp(
    path, nav_shape=(2, 3), sig_shape=(60, 60), dtype=np.uint8, version=2,
    all_present=True,
):
    """Port of the reference's dummy .ebsp writer
    (/root/reference/conftest.py:501-578): version int64 (negated,
    absent for v0), byte-position table (rolled by one; zero marks a
    missing pattern), then records stored rolled by -1 in map order."""
    nr, nc = nav_shape
    sr, sc = sig_shape
    n_patterns = nr * nc
    n_pixels = sr * sc
    n_bytes = n_pixels * np.dtype(dtype).itemsize
    pattern_footer_size = 0 if version == 0 else (16 if version == 1 else 18)

    with open(path, "wb") as f:
        if version > 0:
            np.array(-version, dtype=np.int64).tofile(f)
        starts = np.arange(n_patterns, dtype=np.int64)
        starts *= 16 + n_bytes + pattern_footer_size
        starts += n_patterns * 8
        if version in (1, 2, 3):
            starts += 8
        elif version > 3:
            np.array(0, dtype=np.uint8).tofile(f)
            starts += 9
        starts = np.roll(starts, shift=1)
        if not all_present:
            starts[0] = 0
        starts.tofile(f)
        new_order = np.roll(np.arange(n_patterns), shift=-1)
        if not all_present:
            new_order = new_order[1:]
        header = np.array([0, sr, sc, n_bytes], dtype=np.int32)
        data = np.arange(n_patterns * n_pixels, dtype=dtype).reshape(
            (nr, nc, sr, sc)
        )
        for i in new_order:
            r, c = np.unravel_index(i, (nr, nc))
            header.tofile(f)
            data[r, c].tofile(f)
            if version > 1:
                np.array(1, dtype=bool).tofile(f)
            if version > 0:
                np.array(c, dtype=np.float64).tofile(f)
            if version > 1:
                np.array(1, dtype=bool).tofile(f)
            if version > 0:
                np.array(r, dtype=np.float64).tofile(f)
    return data


class TestOxfordBinaryVersionMatrix:
    """Version/dtype matrix mirroring the reference's own synthetic
    tests (/root/reference/tests/test_io/test_oxford_binary.py:60-130)."""

    @pytest.mark.parametrize(
        "version, dtype, nav_shape",
        [
            (2, np.uint8, (2, 3)),
            (1, np.uint16, (2, 3)),
            (4, np.uint8, (2, 3)),
        ],
    )
    def test_versions_grid(self, tmp_path, version, dtype, nav_shape):
        p = tmp_path / "dummy.ebsp"
        data = _write_dummy_ebsp(p, version=version, dtype=dtype)
        s = kp.load(p)
        assert s.metadata["version"] == version
        assert s.navigation_shape == nav_shape
        assert np.asarray(s.data).dtype == np.dtype(dtype)
        np.testing.assert_array_equal(np.asarray(s.data), data)

    def test_version_0_flat(self, tmp_path):
        p = tmp_path / "dummy.ebsp"
        _write_dummy_ebsp(p, version=0)
        s = kp.load(p)
        assert s.metadata["version"] == 0
        assert s.navigation_shape == (6,)

    def test_not_all_patterns_present(self, tmp_path):
        p = tmp_path / "dummy.ebsp"
        _write_dummy_ebsp(p, version=2, all_present=False)
        s = kp.load(p)
        assert s.navigation_shape == (5,)
        # Stored order is map order rolled by -1 with (0, 0) missing
        # (reference test :77-84 asserts the same beam positions).
        np.testing.assert_allclose(s.metadata["beam_y"], [0, 1, 1, 1, 0])
        np.testing.assert_allclose(s.metadata["beam_x"], [2, 0, 1, 2, 0])

    @pytest.mark.parametrize(
        "nav_shape, sig_shape, n_patterns",
        [((2, 3), (60, 60), 6), ((3, 4), (62, 73), 12)],
    )
    def test_guess_number_of_patterns(
        self, tmp_path, nav_shape, sig_shape, n_patterns
    ):
        from kikuchipy_tpu.io.plugins.oxford_binary import _EbspReader

        p = tmp_path / "dummy.ebsp"
        _write_dummy_ebsp(p, nav_shape=nav_shape, sig_shape=sig_shape)
        reader = _EbspReader(p)
        try:
            assert reader.n_patterns == n_patterns
        finally:
            reader.close()


class TestHDF5FootprintSniffing:
    """Plugin disambiguation on generic .h5 paths (reference
    io/_io.py:198-276 footprint logic)."""

    def test_manufacturer_strings(self, tmp_path, dummy_patterns):
        import h5py
        from kikuchipy_tpu.io._io import _sniff_hdf5_plugin

        cases = [
            (b"kikuchipy", "kikuchipy_h5ebsd"),
            (b"EDAX", "edax_h5ebsd"),
            (b"Bruker Nano", "bruker_h5ebsd"),
        ]
        for man, plugin in cases:
            p = tmp_path / f"{plugin}.h5"
            with h5py.File(p, "w") as f:
                f.create_dataset("Manufacturer", data=man)
            assert _sniff_hdf5_plugin(p) == plugin
        # EDAX-style stray whitespace in the key.
        p = tmp_path / "edax_ws.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset(" Manufacturer", data=np.array([b"EDAX"]))
        assert _sniff_hdf5_plugin(p) == "edax_h5ebsd"

    def test_emsoft_and_oxford_footprints(self, tmp_path):
        import h5py
        from kikuchipy_tpu.io._io import _sniff_hdf5_plugin

        for group, plugin in [
            ("EMData/EBSDmaster", "emsoft_ebsd_master_pattern"),
            ("EMData/ECPmaster", "emsoft_ecp_master_pattern"),
            ("EMData/TKDmaster", "emsoft_tkd_master_pattern"),
            ("EMData/EBSD", "emsoft_ebsd"),
        ]:
            p = tmp_path / f"{plugin}.h5"
            with h5py.File(p, "w") as f:
                f.create_group(group)
            assert _sniff_hdf5_plugin(p) == plugin
        p = tmp_path / "oina.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("Format Version", data=b"7.0")
        assert _sniff_hdf5_plugin(p) == "oxford_h5ebsd"

    def test_unknown_flavor_raises(self, tmp_path):
        import h5py
        from kikuchipy_tpu.io._io import _sniff_hdf5_plugin

        p = tmp_path / "mystery.h5"
        with h5py.File(p, "w") as f:
            f.create_group("nothing_recognizable")
        with pytest.raises(IOError, match="flavor"):
            _sniff_hdf5_plugin(p)

    def test_load_routes_real_files_via_sniffing(self):
        import kikuchipy_tpu as kp

        # Real files with .h5 extensions route through the sniffer.
        s = kp.load(
            "/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5"
        )
        assert s.navigation_shape == (3, 3)
        mp = kp.load(
            "/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/"
            "ni_mc_mp_20kv_uint8_gzip_opts9.h5"
        )
        assert mp.data.shape[-2:] == (401, 401)
