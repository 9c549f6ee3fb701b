"""Write/read guard invariants mirrored from the reference
(SURVEY.md §5.1): row-count coupling, dtype checks, access-mode errors,
overwrite warning."""

from __future__ import annotations

import numpy as np
import pytest

from heparchy_spark.errors import OverwriteWarning, ReadOnlyError, WriteOnlyError
from heparchy_spark.sources import HepReader, HepWriter
from tests.conftest import make_event


def test_row_count_mismatch_raises(spark, tmp_path):
    """write/hdf.py:268-282: first particle-aligned write fixes num_pcls."""
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            evt = proc.new_event()
            evt.pdg = np.arange(5, dtype="int32")
            with pytest.raises(ValueError, match="same length"):
                evt.status = np.arange(6, dtype="int16")


def test_mask_must_be_boolean(spark, tmp_path):
    """write/hdf.py:98-110."""
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            evt = proc.new_event()
            with pytest.raises(TypeError, match="boolean"):
                evt.masks["final"] = np.arange(4)


def test_edge_weights_length_coupling(spark, tmp_path):
    """write/hdf.py:306-320: must follow edges and match their length."""
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            evt = proc.new_event()
            with pytest.raises(ValueError, match="edge"):
                evt.edge_weights = np.ones(3)
            edges = np.empty(3, dtype=[("src", "<i4"), ("dst", "<i4")])
            evt.edges = edges
            with pytest.raises(ValueError, match="edge"):
                evt.edge_weights = np.ones(4)
            evt.edge_weights = np.ones(3)  # now fine


def test_write_side_getters_raise(spark, tmp_path):
    """write/hdf.py:51-58,284-289: WriteOnlyError on every getter."""
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            with pytest.raises(WriteOnlyError):
                proc.process_string
            evt = proc.new_event()
            for attr in ("pmu", "pdg", "status", "helicity", "color",
                         "edges", "edge_weights"):
                with pytest.raises(WriteOnlyError):
                    getattr(evt, attr)
            evt.masks["m"] = np.array([True])
            with pytest.raises(WriteOnlyError):
                evt.masks["m"]


def test_read_side_mutation_raises(spark, tmp_path, rng):
    """read/hdf.py:49-53,140-144: ReadOnlyError on mapping mutation."""
    root = tmp_path / "s"
    with HepWriter(spark, root) as w:
        with w.new_process("p") as proc:
            with proc.new_event() as evt:
                evt.pdg = np.arange(4, dtype="int32")
                evt.masks["final"] = np.ones(4, dtype="bool")
    with HepReader(spark, root) as r:
        evt = r["p"][0]
        with pytest.raises(ReadOnlyError):
            evt.masks["final"] = np.zeros(4, dtype="bool")
        with pytest.raises(ReadOnlyError):
            del evt.masks["final"]


def test_custom_ndim_limit(spark, tmp_path):
    """SURVEY.md §7 watch-list: 1-D/2-D custom ok, >2-D rejected clearly."""
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            evt = proc.new_event()
            evt.custom["ok1"] = np.arange(4).astype("float64")
            evt.custom["ok2"] = np.ones((4, 3))
            with pytest.raises(ValueError, match="ndim"):
                evt.custom["bad"] = np.ones((4, 2, 2))


def test_2d_custom_roundtrip(spark, tmp_path, rng):
    root = tmp_path / "s"
    mat = rng.normal(size=(5, 3))
    with HepWriter(spark, root) as w:
        with w.new_process("p") as proc:
            with proc.new_event() as evt:
                evt.pdg = np.arange(5, dtype="int32")
                evt.custom["embed"] = mat
    with HepReader(spark, root) as r:
        np.testing.assert_allclose(r["p"][0].custom["embed"], mat)


def test_overwrite_store_warns(spark, tmp_path):
    """write/hdf.py:75-77 overwrite-warn semantics at store granularity."""
    root = tmp_path / "s"
    with HepWriter(spark, root) as w:
        with w.new_process("p") as proc:
            with proc.new_event() as evt:
                evt.pdg = np.arange(2, dtype="int32")
    with pytest.warns(OverwriteWarning):
        with HepWriter(spark, root) as w:
            with w.new_process("q") as proc:
                with proc.new_event() as evt:
                    evt.pdg = np.arange(2, dtype="int32")
    with HepReader(spark, root) as r:
        assert r.keys() == ["q"]


def test_clobbering_non_store_refused(spark, tmp_path):
    root = tmp_path / "not_a_store"
    root.mkdir()
    (root / "precious.txt").write_text("hi")
    with pytest.raises(FileExistsError):
        HepWriter(spark, root).__enter__()


def test_duplicate_process_rejected(spark, tmp_path):
    with HepWriter(spark, tmp_path / "s") as w:
        with w.new_process("p") as proc:
            with proc.new_event() as evt:
                evt.pdg = np.arange(2, dtype="int32")
        with pytest.raises(ValueError, match="already"):
            w.new_process("p")


def test_open_file_dispatch(spark, tmp_path, rng):
    """heparchy/__init__.py:19-98 parity: mode x process -> 4 handle types."""
    import heparchy_spark as hs

    root = tmp_path / "s"
    data = make_event(rng, 6)
    with hs.open_file(root, "w", process="signal", spark=spark) as proc:
        with proc.new_event() as evt:
            evt.pmu = data["pmu"]
    with hs.open_file(root, "r", spark=spark) as r:
        assert r.keys() == ["signal"]
    with hs.open_file(root, "r", process="signal", spark=spark) as proc:
        np.testing.assert_array_equal(proc[0].pmu, data["pmu"])
    with pytest.raises(ValueError, match="mode"):
        with hs.open_file(root, "x", spark=spark):
            pass


@pytest.mark.parametrize("codec", ["gzip", "zstd", "snappy", "lzf"])
def test_compression_codecs_roundtrip(spark, tmp_path, rng, codec):
    """S4: every codec knob (incl. the lzf->zstd mapping) writes a readable
    store with identical data."""
    root = tmp_path / codec
    data = make_event(rng, 8)
    with HepWriter(spark, root, compression=codec) as w:
        with w.new_process("p") as proc:
            with proc.new_event() as evt:
                evt.pmu = data["pmu"]
    with HepReader(spark, root) as r:
        np.testing.assert_array_equal(r["p"][0].pmu, data["pmu"])
