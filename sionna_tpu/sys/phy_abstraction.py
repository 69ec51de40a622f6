"""Physical-layer abstraction (reference: src/sionna/sys/
phy_abstraction.py:30; fresh JAX implementation).

BLER tables are loaded and spline-interpolated on host at
construction; the per-slot ``__call__`` is pure JAX (table gathers +
elementwise math + HARQ sampling with an explicit key) so system-level
loops jit end-to-end on TPU.
"""

import json
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from ..phy.block import Block
from ..phy.config import config
from ..phy.utils.misc import (DeepUpdateDict, dict_keys_to_int, to_list,
                              Interpolate, MCSDecoder, TransportBlock,
                              SingleLinkChannel,
                              SplineGriddataInterpolation,
                              scalar_to_shaped_tensor, lin_to_db)
from ..phy.utils.tensors import gather_from_batched_indices
from ..phy.utils.sim import sim_ber
from ..phy.nr.utils import (MCSDecoderNR, TransportBlockNR,
                            CodedAWGNChannelNR)
from .effective_sinr import EffectiveSINR, EESM

__all__ = ["PHYAbstraction"]

_BLER_DIR = os.path.join(os.path.dirname(__file__), "bler_tables")


class PHYAbstraction(Block):
    """Maps per-stream SINR to decoded bits / HARQ feedback / BLER via
    precomputed AWGN BLER tables (reference phy_abstraction.py:30).

    Call: (mcs_index, sinr=None, sinr_eff=None,
    num_allocated_re=None, mcs_table_index=1, mcs_category=0,
    check_mcs_index_validity=True, key=None) ->
    (num_decoded_bits, harq_feedback, sinr_eff, tbler, bler).
    """

    def __init__(self, interp_fun=None, mcs_decoder_fun=None,
                 transport_block_fun=None, sinr_effective_fun=None,
                 load_bler_tables_from="default",
                 snr_db_interp_min_max_delta=(-5, 30.01, .1),
                 cbs_interp_min_max_delta=(24, 8448, 100),
                 bler_interp_delta=0.01, precision=None, **kwargs):
        super().__init__(precision=precision)

        if interp_fun is None:
            interp_fun = SplineGriddataInterpolation()
        if mcs_decoder_fun is None:
            mcs_decoder_fun = MCSDecoderNR(precision=precision)
        if transport_block_fun is None:
            transport_block_fun = TransportBlockNR(precision=precision)
        if sinr_effective_fun is None:
            sinr_effective_fun = EESM(precision=precision)

        if not isinstance(interp_fun, Interpolate):
            raise ValueError("interp_fun must be an Interpolate")
        if not isinstance(mcs_decoder_fun, MCSDecoder):
            raise ValueError("mcs_decoder_fun must be an MCSDecoder")
        if not isinstance(transport_block_fun, TransportBlock):
            raise ValueError(
                "transport_block_fun must be a TransportBlock")
        if not isinstance(sinr_effective_fun, EffectiveSINR):
            raise ValueError(
                "sinr_effective_fun must be an EffectiveSINR")

        self._kwargs = kwargs
        self._bler_table = None
        self._bler_table_interp = None
        self._snr_table_interp = None
        self._interp_fun = interp_fun
        self._mcs_decoder_fun = mcs_decoder_fun
        self._transport_block_fun = transport_block_fun
        self._sinr_effective_fun = sinr_effective_fun

        self._cbs_interp = None
        self._snr_dbs_interp = None
        self._blers_interp = None

        if load_bler_tables_from == "default":
            names = ["PUSCH_table1.json", "PUSCH_table2.json",
                     "PDSCH_table1.json", "PDSCH_table2.json",
                     "PDSCH_table3.json", "PDSCH_table4.json"]
            self.bler_table_filenames = [
                os.path.join(_BLER_DIR, f) for f in names]
        else:
            self.bler_table_filenames = load_bler_tables_from

        self.snr_db_interp_min_max_delta = snr_db_interp_min_max_delta
        self.cbs_interp_min_max_delta = cbs_interp_min_max_delta
        self.bler_interp_delta = bler_interp_delta

    # ------------------------------------------------------------------
    # Table loading / properties
    # ------------------------------------------------------------------
    @staticmethod
    def load_table(filename):
        """Loads a BLER table stored as JSON."""
        with open(filename, encoding="utf-8") as f:
            return json.load(f, object_hook=dict_keys_to_int)

    @property
    def bler_table_filenames(self):
        return self._bler_table_filenames

    @bler_table_filenames.setter
    def bler_table_filenames(self, value):
        self._bler_table_filenames = to_list(value)
        self._bler_table = DeepUpdateDict({"category": {}})
        for f in self._bler_table_filenames:
            try:
                with open(f, encoding="utf-8") as fh:
                    sub = json.load(fh, object_hook=dict_keys_to_int)
                self._bler_table.deep_update(
                    sub, stop_at_keys=("CBS", "SNR_db"))
            except FileNotFoundError:
                warnings.warn(f"BLER table file '{f}' does not exist. "
                              "Skipping...")
        self.validate_bler_table()

    @property
    def bler_table(self):
        """Nested dict: ['category'][cat]['index'][tab]['MCS'][mcs]
        with 'CBS'/'SNR_db' leaves."""
        return self._bler_table

    @property
    def bler_table_interp(self):
        """[n_cat, n_tables, n_mcs, n_cbs, n_snr] interpolated BLER"""
        return self._bler_table_interp

    @property
    def snr_table_interp(self):
        """[n_cat, n_tables, n_mcs, n_cbs, n_bler] interpolated SNR"""
        return self._snr_table_interp

    @property
    def snr_db_interp_min_max_delta(self):
        return self._snr_db_interp_min_max_delta

    @snr_db_interp_min_max_delta.setter
    def snr_db_interp_min_max_delta(self, value):
        if not (hasattr(value, "__len__") and len(value) == 3):
            raise ValueError(
                "snr_db_interp_min_max_delta must have length 3")
        self._snr_db_interp_min_max_delta = tuple(value)
        self._snr_dbs_interp = np.arange(*self._snr_db_interp_min_max_delta)
        if self._bler_table is not None and self._cbs_interp is not None:
            self._interpolate_bler()

    @property
    def cbs_interp_min_max_delta(self):
        return self._cbs_interp_min_max_delta

    @cbs_interp_min_max_delta.setter
    def cbs_interp_min_max_delta(self, value):
        if not (hasattr(value, "__len__") and len(value) == 3):
            raise ValueError(
                "cbs_interp_min_max_delta must have length 3")
        self._cbs_interp_min_max_delta = tuple(value)
        self._cbs_interp = np.arange(*self._cbs_interp_min_max_delta)
        if self._bler_table is not None:
            if self._blers_interp is not None:
                self._interpolate_snr()
            if self._snr_dbs_interp is not None:
                self._interpolate_bler()

    @property
    def bler_interp_delta(self):
        return self._bler_interp_delta

    @bler_interp_delta.setter
    def bler_interp_delta(self, value):
        self._bler_interp_delta = float(value)
        self._blers_interp = np.arange(0, 1, self._bler_interp_delta)
        if self._bler_table is not None and self._cbs_interp is not None:
            self._interpolate_snr()

    # ------------------------------------------------------------------
    # Retrieval
    # ------------------------------------------------------------------
    def get_idx_from_grid(self, val, which):
        """Index of SNR [dB] or CBS values in the interpolation grid
        (reference phy_abstraction.py:496)."""
        if which == "snr":
            len_grid = len(self._snr_dbs_interp)
            mmd = self._snr_db_interp_min_max_delta
        elif which == "cbs":
            len_grid = len(self._cbs_interp)
            mmd = self._cbs_interp_min_max_delta
        else:
            raise ValueError("which must be 'snr' or 'cbs'")
        idx = jnp.round((jnp.asarray(val, self.rdtype) - mmd[0])
                        / mmd[2]).astype(jnp.int32)
        return jnp.clip(idx, 0, len_grid - 1)

    def get_bler(self, mcs_index, mcs_table_index, mcs_category,
                 cb_size, snr_eff):
        """BLER lookup from the interpolated tables (reference
        phy_abstraction.py:537)."""
        snr_eff = jnp.asarray(snr_eff, self.rdtype)
        shape = snr_eff.shape
        mcs_category = scalar_to_shaped_tensor(mcs_category, jnp.int32,
                                               shape)
        mcs_index = scalar_to_shaped_tensor(mcs_index, jnp.int32, shape)
        mcs_table_index = scalar_to_shaped_tensor(mcs_table_index,
                                                  jnp.int32, shape)
        cb_size = scalar_to_shaped_tensor(cb_size, jnp.int32, shape)

        snr_eff_db = lin_to_db(jnp.maximum(snr_eff, 1e-30),
                               precision=self.precision)
        snr_db_idx = self.get_idx_from_grid(snr_eff_db, "snr")
        cbs_idx = self.get_idx_from_grid(cb_size, "cbs")

        idx = jnp.stack([mcs_category, mcs_table_index - 1, mcs_index,
                         cbs_idx, snr_db_idx], axis=-1)
        return gather_from_batched_indices(
            jnp.asarray(self._bler_table_interp, self.rdtype), idx)

    def call(self, mcs_index, sinr=None, sinr_eff=None,
             num_allocated_re=None, mcs_table_index=1, mcs_category=0,
             check_mcs_index_validity=True, key=None, **kwargs):
        if not ((sinr is not None)
                ^ ((sinr_eff is not None)
                   and (num_allocated_re is not None))):
            raise ValueError(
                "Either 'sinr' or ('sinr_eff','num_allocated_re') is "
                "required as input")
        if key is None:
            try:
                tracing = type(jax.core.trace_ctx.trace).__name__ \
                    != "EvalTrace"
            except AttributeError:
                tracing = False
            if tracing:
                # stateful key creation would leak a tracer; inside
                # jit callers must pass an explicit key for fresh
                # randomness (HARQ realizations are deterministic
                # otherwise)
                key = jax.random.PRNGKey(0)
            else:
                key = config.next_key()

        if sinr is not None:
            sinr = jnp.asarray(sinr, self.rdtype)
            num_allocated_re = jnp.sum((sinr > 0).astype(jnp.int32),
                                       axis=(-4, -3, -1))
            sinr_eff = self._sinr_effective_fun(
                sinr, mcs_index=mcs_index,
                mcs_table_index=mcs_table_index,
                mcs_category=mcs_category, per_stream=False, **kwargs)
        else:
            sinr_eff = jnp.asarray(sinr_eff, self.rdtype)
            num_allocated_re = jnp.asarray(num_allocated_re, jnp.int32)

        ut_is_scheduled = num_allocated_re > 0

        # MCS decode + transport block segmentation are host-side
        # table lookups; keep them NumPy for trace-time embedding when
        # the inputs are static, else vectorize via jnp
        modulation_order, target_coderate = self._mcs_decoder_fun(
            mcs_index, mcs_table_index, mcs_category,
            check_index_validity=check_mcs_index_validity, **kwargs)
        modulation_order = jnp.asarray(modulation_order, jnp.int32)
        target_coderate = jnp.asarray(target_coderate, self.rdtype)

        num_coded_bits = modulation_order * num_allocated_re
        # pass through untouched: the transport-block function runs
        # its traceable jnp path when inputs are traced (jitted SYS
        # loops) and its NumPy path otherwise
        cb_size, num_cb = self._transport_block_fun(
            modulation_order, target_coderate, num_coded_bits,
            **kwargs)
        cb_size = jnp.asarray(cb_size, jnp.int32)
        num_cb = jnp.asarray(num_cb, jnp.int32)

        bler = self.get_bler(mcs_index, mcs_table_index, mcs_category,
                             cb_size, sinr_eff)

        tbler = 1. - jnp.power(1. - bler,
                               num_cb.astype(self.rdtype))

        bler = jnp.where(ut_is_scheduled, bler, -1.)
        tbler = jnp.where(ut_is_scheduled, tbler, -1.)

        rnd = jax.random.uniform(key, tbler.shape, self.rdtype)
        harq_feedback = jnp.where(rnd < tbler, 0, 1).astype(jnp.int32)

        num_decoded_bits = harq_feedback * num_cb * cb_size
        num_decoded_bits = jnp.where(ut_is_scheduled,
                                     num_decoded_bits, 0)
        harq_feedback = jnp.where(ut_is_scheduled, harq_feedback, -1)

        return num_decoded_bits, harq_feedback, sinr_eff, tbler, bler

    # ------------------------------------------------------------------
    # Interpolation
    # ------------------------------------------------------------------
    def _get_batch_size_interp_mat(self):
        cats = list(self._bler_table["category"].keys())
        max_tab, max_mcs = [], []
        for c in cats:
            tabs = list(self._bler_table["category"][c]["index"].keys())
            max_tab.append(max(tabs))
            for t in tabs:
                mcss = list(self._bler_table["category"][c]["index"][t]
                            ["MCS"].keys())
                max_mcs.append(max(mcss))
        if cats and max_tab and max_mcs:
            return [max(cats) + 1, max(max_tab), max(max_mcs) + 1]
        return [0, 0, 0]

    def _interpolate_bler(self):
        """Interpolates BLER over a fine (CBS, SNR) grid
        (reference phy_abstraction.py:720)."""
        shape = self._get_batch_size_interp_mat()
        table = np.full(shape + [len(self._cbs_interp),
                                 len(self._snr_dbs_interp)], np.inf)
        for cat, cat_tab in self._bler_table["category"].items():
            for tab, tab_tab in cat_tab["index"].items():
                for mcs, mcs_tab in tab_tab["MCS"].items():
                    cbs_vec = list(mcs_tab["CBS"].keys())
                    snr_vec = mcs_tab["SNR_db"]
                    bler_val = np.array(
                        [mcs_tab["CBS"][c]["BLER"] for c in cbs_vec])
                    try:
                        interp = self._interp_fun.struct(
                            bler_val, cbs_vec, snr_vec,
                            self._cbs_interp, self._snr_dbs_interp,
                            **self._kwargs)
                    except ValueError as e:
                        warnings.warn(
                            f"SINR-to-BLER interpolation failed for "
                            f"category {cat}, index {tab}, MCS {mcs}: "
                            f"{e}")
                        continue
                    table[cat, tab - 1, mcs] = np.clip(
                        np.asarray(interp), 0., 1.)
        self._bler_table_interp = table.astype(self.np_rdtype)

    def _interpolate_snr(self):
        """Interpolates SNR over a fine (CBS, BLER) grid
        (reference phy_abstraction.py:784)."""
        shape = self._get_batch_size_interp_mat()
        table = np.full(shape + [len(self._cbs_interp),
                                 len(self._blers_interp)], np.inf)
        for cat, cat_tab in self._bler_table["category"].items():
            for tab, tab_tab in cat_tab["index"].items():
                for mcs, mcs_tab in tab_tab["MCS"].items():
                    snr_vec = mcs_tab["SNR_db"]
                    cbs_vec = list(mcs_tab["CBS"].keys())
                    snr_tile = np.tile(snr_vec, len(cbs_vec))
                    cbs_rep = np.repeat(cbs_vec, len(snr_vec))
                    bler_vec = [b for c in cbs_vec
                                for b in mcs_tab["CBS"][c]["BLER"]]
                    try:
                        interp = self._interp_fun.unstruct(
                            snr_tile, cbs_rep, bler_vec,
                            self._cbs_interp, self._blers_interp,
                            **self._kwargs)
                    except ValueError as e:
                        warnings.warn(
                            f"BLER-to-SINR interpolation failed for "
                            f"category {cat}, index {tab}, MCS {mcs}: "
                            f"{e}")
                        continue
                    table[cat, tab - 1, mcs] = np.asarray(interp)
        self._snr_table_interp = table.astype(self.np_rdtype)

    def validate_bler_table(self):
        """Validates the nested structure of ``bler_table``
        (reference phy_abstraction.py:838)."""
        if not isinstance(self._bler_table, dict):
            raise ValueError("Must be a dictionary")
        for cat, cat_tab in self._bler_table["category"].items():
            if cat < 0:
                raise ValueError("Categories must be nonnegative")
            if set(cat_tab.keys()) != {"index"}:
                raise ValueError("Key must be 'index'")
            for tab, tab_tab in cat_tab["index"].items():
                if tab < 1:
                    raise ValueError("Table indices must be positive")
                if set(tab_tab.keys()) != {"MCS"}:
                    raise ValueError("Key must be 'MCS'")
                for mcs, mcs_tab in tab_tab["MCS"].items():
                    if mcs < 0:
                        raise ValueError("MCS must be nonnegative")
                    if set(mcs_tab.keys()) != {"CBS", "SNR_db"}:
                        raise ValueError(
                            "Keys must be ['CBS', 'SNR_db']")
        return True

    def plot(self, plot_subset="all", show=True, save_path=None):
        """Plots the SINR-to-BLER tables (reference
        phy_abstraction.py:888)."""
        import matplotlib.pyplot as plt
        fignames = []
        if plot_subset == "all":
            plot_subset = self._bler_table
        for cat, cat_tab in plot_subset["category"].items():
            for tab, tab_tab in cat_tab["index"].items():
                for mcs in to_list(tab_tab["MCS"]):
                    try:
                        mcs_tab = self._bler_table["category"][cat][
                            "index"][tab]["MCS"][mcs]
                    except KeyError:
                        continue
                    fig, ax = plt.subplots()
                    for cbs, leaf in mcs_tab["CBS"].items():
                        ax.semilogy(mcs_tab["SNR_db"], leaf["BLER"],
                                    label=f"code block size={cbs}")
                    ax.set_title(f"MCS {mcs} (category {cat}, "
                                 f"table {tab})")
                    ax.legend()
                    ax.grid(True)
                    ax.set_xlabel("SNR [dB]")
                    ax.set_ylabel("BLER")
                    if save_path is not None:
                        os.makedirs(save_path, exist_ok=True)
                        name = os.path.join(
                            save_path,
                            f"category{cat}_table{tab}_mcs{mcs}.png")
                        fig.savefig(name)
                        fignames.append(name)
                    if show:
                        plt.show()
                    plt.close(fig)
        return fignames

    def new_bler_table(self, snr_dbs, cb_sizes, sim_set, channel=None,
                       filename=None, write_mode="w", batch_size=1000,
                       max_mc_iter=100, target_bler=None,
                       early_stop=True, verbose=True, **kwargs):
        """Monte-Carlo generation of new SNR->BLER tables via
        :func:`~sionna_tpu.phy.utils.sim_ber` (reference
        phy_abstraction.py:993).  The result is merged into
        ``bler_table``."""
        if channel is None:
            channel = CodedAWGNChannelNR(precision=self.precision)
        if not isinstance(channel, SingleLinkChannel):
            raise ValueError("'channel' must be a SingleLinkChannel")
        if write_mode not in ("a", "w"):
            raise ValueError("'write_mode' must be 'a' or 'w'")

        snr_dbs = to_list(snr_dbs)
        cb_sizes = to_list(cb_sizes)

        if (filename is not None and os.path.isfile(filename)
                and write_mode == "a"):
            new_table = self.load_table(filename)
        else:
            new_table = {"category": {}}

        for cat, sim_cat in sim_set["category"].items():
            new_table["category"].setdefault(cat, {"index": {}})
            for tab, sim_tab in sim_cat["index"].items():
                new_table["category"][cat]["index"].setdefault(
                    tab, {"MCS": {}})
                for mcs in sim_tab["MCS"]:
                    try:
                        mod, rate = self._mcs_decoder_fun(
                            mcs, tab, cat, **self._kwargs)
                        mod = int(np.asarray(mod))
                        rate = float(np.asarray(rate))
                    except ValueError as e:
                        if verbose:
                            print(f"Invalid (category={cat}, "
                                  f"index={tab}, MCS={mcs}): {e}; "
                                  "skipping")
                        continue
                    ebno_dbs = [s - 10 * np.log10(mod * rate)
                                for s in snr_dbs]
                    mcs_entry = None
                    for cbs in cb_sizes:
                        if verbose:
                            print(f"Simulating category={cat}, "
                                  f"index={tab}, CBS={cbs}, MCS={mcs}")
                        try:
                            channel.num_bits_per_symbol = mod
                            channel.num_info_bits = int(cbs)
                            channel.target_coderate = rate
                            _, bler = sim_ber(
                                channel, ebno_dbs, batch_size,
                                max_mc_iter=max_mc_iter,
                                early_stop=early_stop,
                                target_bler=target_bler,
                                verbose=verbose,
                                precision=self.precision, **kwargs)
                            if mcs_entry is None:
                                mcs_entry = {"CBS": {},
                                             "SNR_db": snr_dbs}
                                new_table["category"][cat]["index"][
                                    tab]["MCS"][mcs] = mcs_entry
                            mcs_entry["CBS"][int(cbs)] = {
                                "BLER": np.asarray(bler).tolist()}
                            if filename is not None:
                                with open(filename, "w",
                                          encoding="utf-8") as f:
                                    json.dump(new_table, f, indent=6)
                        except ValueError as e:
                            if verbose:
                                print(f"Simulation failed for "
                                      f"(category={cat}, index={tab}, "
                                      f"CBS={cbs}, MCS={mcs}): {e}")

        self._bler_table.deep_update(new_table,
                                     stop_at_keys=("CBS", "SNR_db"))
        self.validate_bler_table()
        self._interpolate_bler()
        self._interpolate_snr()
        if filename is not None:
            self._bler_table_filenames.append(filename)
        return new_table
