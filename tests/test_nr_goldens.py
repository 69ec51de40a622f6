"""Reference golden-vector tests for the NR stack.

Every stored corpus under tests/nr/ is exercised here with the exact
generating configuration recovered from the reference test suite:

- reference_dmrs_{1,2}.npy      (ref test/unit/nr/test_pusch_config.py:17-64)
- pusch_dmrs_precoded_*.npy     (ref test/unit/nr/test_pusch_config.py:169-228)
- tb_refs/tb_testcase_*.npz     (ref test/unit/nr/test_tb_encoder.py:17-63)
- pusch_test_configs/*          full 84-waveform sweep (slow marker;
                                a 12-case subset runs in tests/test_nr.py)
"""

import glob
import json
import os

import numpy as np
import pytest

from sionna_tpu.phy.nr import PUSCHConfig, TBEncoder, TBDecoder

NR_DIR = os.path.join(os.path.dirname(__file__), "nr")


# --------------------------------------------------------------- #
# DMRS grids vs reference implementation
# --------------------------------------------------------------- #

def _dmrs_pilot_sweep(n_size_grid):
    """Reproduce the reference's pilot-collection loop
    (test_pusch_config.py:17-39): config-type-2 double-symbol DMRS,
    swept over cell id / slot / port."""
    pc = PUSCHConfig()
    pc.carrier.n_size_grid = n_size_grid
    pc.dmrs.config_type = 2
    pc.dmrs.num_cdm_groups_without_data = 3
    pc.dmrs.additional_position = 1
    pc.dmrs.length = 2
    pc.dmrs.n_id = [4, 4]
    p = []
    for n_cell_id in [0, 1, 10, 24, 99, 1006]:
        for slot_number in [0, 1, 5, 9]:
            for port_set in [0, 3, 4, 9, 11]:
                pc.carrier.n_cell_id = n_cell_id
                pc.carrier.slot_number = slot_number
                pc.dmrs.dmrs_port_set = [port_set]
                a = np.asarray(pc.dmrs_grid)
                pilots = np.concatenate(
                    [a[0, :, 2], a[0, :, 3], a[0, :, 10], a[0, :, 11]])
                pilots = pilots[np.where(pilots)] / np.sqrt(3)
                p.append(pilots)
    return np.transpose(np.array(p))


@pytest.mark.parametrize("n_size_grid,fname", [
    (1, "reference_dmrs_1.npy"),
    (4, "reference_dmrs_2.npy"),
])
def test_dmrs_grid_against_reference(n_size_grid, fname):
    ref = np.load(os.path.join(NR_DIR, fname))
    got = _dmrs_pilot_sweep(n_size_grid)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


# TPMI counts per (num_layers, num_antenna_ports), TS 38.211 tables
# 6.3.1.5-1..7 (same sweep as the reference test).
_PRECODED_CASES = [(1, 2, 6), (1, 4, 28), (2, 2, 3), (2, 4, 22),
                   (3, 4, 7), (4, 4, 5)]


@pytest.mark.parametrize("num_layers,num_ports,num_tpmi",
                         _PRECODED_CASES)
def test_dmrs_precoded_against_reference(num_layers, num_ports,
                                         num_tpmi):
    """Codebook-precoded DMRS grids match the stored reference for
    every TPMI (ref test_pusch_config.py:169)."""
    pc = PUSCHConfig()
    pc.carrier.n_size_grid = 1
    pc.carrier.slot_number = 1
    pc.dmrs.additional_position = 0
    pc.dmrs.config_type = 2
    pc.dmrs.num_cdm_groups_without_data = 3
    pc.dmrs.length = 2
    pc.dmrs.n_id = [8, 8]
    pc.precoding = "codebook"
    pc.num_layers = num_layers
    pc.num_antenna_ports = num_ports
    ref = np.load(os.path.join(
        NR_DIR, f"pusch_dmrs_precoded_{num_layers}_layer_"
                f"{num_ports}_ports.npy"), allow_pickle=True)
    assert len(ref) >= num_tpmi
    for i in range(num_tpmi):
        pc.tpmi = i
        got = np.asarray(pc.dmrs_grid_precoded) / np.sqrt(3)
        np.testing.assert_allclose(got, ref[i], atol=1e-6,
                                   err_msg=f"tpmi={i}")


# --------------------------------------------------------------- #
# Transport-block encoder vs MATLAB-generated references
# --------------------------------------------------------------- #

_TB_CASES = sorted(glob.glob(os.path.join(NR_DIR, "tb_refs",
                                          "tb_testcase_*.npz")))


@pytest.mark.parametrize("path", _TB_CASES,
                         ids=[os.path.basename(p) for p in _TB_CASES])
def test_tb_encoder_against_reference(path):
    """Bit-exact TB encoding (segmentation + LDPC + rate matching +
    scrambling + interleaving) vs stored references, and decoder
    round-trip (ref test_tb_encoder.py:17-63)."""
    data = np.load(path)
    u_ref = data["u_ref"]
    c_ref = data["c_ref"]
    enc = TBEncoder(
        num_coded_bits=c_ref.shape[1],
        target_tb_size=u_ref.shape[1],
        target_coderate=float(data["coderate"]),
        num_bits_per_symbol=int(data["num_bits_per_symbol"]),
        num_layers=int(data["num_layers"]),
        n_rnti=int(data["n_rnti"]),
        n_id=int(data["n_id"]),
        channel_type="PUSCH",
        codeword_index=0,
        use_scrambler=True)
    c = np.asarray(enc(u_ref.astype(np.float32)))
    np.testing.assert_array_equal(c.astype(np.uint8), c_ref)
    # unscrambled variant
    enc_ns = TBEncoder(
        num_coded_bits=c_ref.shape[1],
        target_tb_size=u_ref.shape[1],
        target_coderate=float(data["coderate"]),
        num_bits_per_symbol=int(data["num_bits_per_symbol"]),
        num_layers=int(data["num_layers"]),
        n_rnti=int(data["n_rnti"]),
        n_id=int(data["n_id"]),
        use_scrambler=False)
    c_ns = np.asarray(enc_ns(u_ref.astype(np.float32)))
    np.testing.assert_array_equal(c_ns.astype(np.int8),
                                  data["c_ref_no_scr"])
    # decoder round-trip on clean LLRs
    dec = TBDecoder(enc, cn_update="minsum")
    u_hat, crc_ok = dec(2.0 * c - 1.0)
    np.testing.assert_array_equal(np.asarray(u_hat).astype(np.int8),
                                  u_ref)
    assert np.all(np.asarray(crc_ok))


# --------------------------------------------------------------- #
# Full 84-waveform PUSCH transmitter sweep (slow)
# --------------------------------------------------------------- #

# ids with BOTH config and stored waveform (the reference corpus
# ships test_83.json without a test_83.npy)
_ALL_IDS = sorted(
    int(os.path.basename(p)[5:-5]) for p in
    glob.glob(os.path.join(NR_DIR, "pusch_test_configs", "*.json"))
    if os.path.isfile(p[:-5] + ".npy"))
# the fast subset already covered in every CI run by tests/test_nr.py
_FAST_SUBSET = {0, 5, 11, 19, 27, 35, 43, 51, 59, 67, 75, 82}


@pytest.mark.slow
@pytest.mark.parametrize("test_id",
                         [i for i in _ALL_IDS if i not in _FAST_SUBSET])
def test_pusch_transmitter_golden_full(test_id):
    from test_nr import run_golden
    assert run_golden(test_id)
