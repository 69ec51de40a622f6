"""5G NR utilities (reference: src/sionna/phy/nr/utils.py:16,80,374,
473; fresh implementations).

These are configuration-time computations (TS 38.214 procedures) and
run host-side in NumPy; array inputs are supported elementwise.
"""

import numpy as np

from ..fec.scrambling import generate_prng_seq as _generate_prng_seq

__all__ = ["generate_prng_seq", "decode_mcs_index",
           "calculate_num_coded_bits", "calculate_tb_size",
           "MCSDecoderNR", "TransportBlockNR", "CodedAWGNChannelNR"]


def generate_prng_seq(length, c_init):
    """Gold sequence per TS 38.211 Sec. 5.2.1
    (reference nr/utils.py:16)."""
    return _generate_prng_seq(length, c_init)


# MCS tables (TS 38.214 Tables 5.1.3.1-1/2/3/4 and 6.1.4.1-1/2)
_MOD_ORDERS = np.array([
    [  # PUSCH with transform precoding
        [1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4, 4, 4, 4, 4, 6,
         6, 6, 6, 6, 6, 6, 6, 6, 6, 6, -1],
        [1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 4, 4,
         4, 4, 4, 4, 4, 4, 6, 6, 6, 6, -1],
        [-1] * 29,
        [-1] * 29,
    ],
    [  # PDSCH or PUSCH without transform precoding
        [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4, 4, 4, 4, 4, 6,
         6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
        [2, 2, 2, 2, 2, 4, 4, 4, 4, 4, 4, 6, 6, 6, 6, 6, 6,
         6, 6, 6, 8, 8, 8, 8, 8, 8, 8, 8, -1],
        [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4,
         4, 4, 4, 6, 6, 6, 6, 6, 6, 6, 6],
        [2, 2, 2, 4, 4, 4, 6, 6, 6, 6, 6, 6, 6, 6, 6, 8, 8, 8,
         8, 8, 8, 8, 8, 10, 10, 10, 10, -1, -1],
    ],
])

_TARGET_RATES = np.array([
    [  # PUSCH with transform precoding (pi2bpsk variants both rows)
        [240, 314, 193, 251, 308, 379, 449, 526, 602,
         679, 340, 378, 434, 490, 553, 616, 658, 466, 517,
         567, 616, 666, 719, 772, 822, 873, 910, 948, -1],
        [60, 80, 100, 128, 156, 198, 120, 157,
         193, 251, 308, 379, 449, 526, 602, 679, 378, 434,
         490, 553, 616, 658, 699, 772, 567, 616, 666, 772, -1],
        [-1] * 29,
        [-1] * 29,
    ],
    [
        [120, 157, 193, 251, 308, 379, 449, 526, 602, 679,
         340, 378, 434, 490, 553, 616, 658, 438, 466, 517,
         567, 616, 666, 719, 772, 822, 873, 910, 948],
        [120, 193, 308, 449, 602, 378, 434, 490, 553, 616,
         658, 466, 517, 567, 616, 666, 719, 772, 822, 873,
         682.5, 711, 754, 797, 841, 885, 916.5, 948, -1],
        [30, 40, 50, 64, 78, 99, 120, 157, 193, 251, 308,
         379, 449, 526, 602, 340, 378, 434, 490, 553, 616,
         438, 466, 517, 567, 616, 666, 719, 772],
        [120, 193, 449, 378, 490, 616, 466, 517, 567, 616,
         666, 719, 772, 822, 873, 682.5, 711, 754, 797, 841,
         885, 916.5, 948, 805.5, 853, 900.5, 948, -1, -1],
    ],
])


def decode_mcs_index(mcs_index, table_index=1, is_pusch=True,
                     transform_precoding=False, pi2bpsk=False,
                     check_index_validity=True, verbose=False):
    """MCS index -> (modulation_order, target_rate)
    (TS 38.214; reference nr/utils.py:80)."""
    mcs_index = np.asarray(mcs_index, np.int32)
    shape = mcs_index.shape
    table_index = np.broadcast_to(np.asarray(table_index, np.int32),
                                  shape)
    is_pusch = np.broadcast_to(np.asarray(is_pusch, bool), shape)
    transform_precoding = np.broadcast_to(
        np.asarray(transform_precoding, bool), shape)
    pi2bpsk = np.broadcast_to(np.asarray(pi2bpsk, bool), shape)
    if np.any(mcs_index < 0) or np.any(mcs_index > 28):
        raise ValueError("MCS index must be in [0, 28]")
    if not np.all(np.isin(table_index, [1, 2, 3, 4])):
        raise ValueError("table_index must contain values in [1,2,3,4]")

    # with transform precoding on PUSCH, pi2bpsk toggles between two
    # sub-tables; otherwise the standard tables apply
    channel_idx = (~is_pusch | ~transform_precoding).astype(np.int32)
    row = table_index - 1
    mod = _MOD_ORDERS[channel_idx, row, mcs_index]
    rate = _TARGET_RATES[channel_idx, row, mcs_index] / 1024.0
    if check_index_validity and np.any(mod < 0):
        raise ValueError("Invalid MCS index for this configuration")
    return mod.astype(np.int32), rate.astype(np.float32)


def decode_mcs_index_jit(mcs_index, table_index=1, is_pusch=True,
                         transform_precoding=False, pi2bpsk=False):
    """Traceable variant of :func:`decode_mcs_index` (pure jnp table
    gathers, no value validation — invalid entries return -1).  Used
    by the jitted SYS link-adaptation path."""
    import jax.numpy as jnp
    mcs = jnp.asarray(mcs_index, jnp.int32)
    shape = mcs.shape
    ti = jnp.broadcast_to(jnp.asarray(table_index, jnp.int32), shape)
    ip = jnp.broadcast_to(jnp.asarray(is_pusch, bool), shape)
    tp = jnp.broadcast_to(jnp.asarray(transform_precoding, bool),
                          shape)
    channel_idx = (~ip | ~tp).astype(jnp.int32)
    mod = jnp.asarray(_MOD_ORDERS)[channel_idx, ti - 1, mcs]
    rate = jnp.asarray(_TARGET_RATES)[channel_idx, ti - 1, mcs] \
        / 1024.0
    return mod.astype(jnp.int32), rate.astype(jnp.float32)


def calculate_cb_size_jit(modulation_order, target_coderate,
                          num_coded_bits):
    """Traceable (cb_size, num_cb) per TS 38.214 Sec. 5.1.3.2 —
    mirrors the quantization arithmetic of :func:`calculate_tb_size`
    in jnp for the case where ``num_coded_bits`` is given."""
    import jax.numpy as jnp
    target_coderate = jnp.asarray(target_coderate, jnp.float32)
    num_coded_bits = jnp.asarray(num_coded_bits, jnp.float32)
    tts = jnp.maximum(target_coderate * num_coded_bits, 0.)

    n_small = jnp.maximum(
        3.0, jnp.floor(jnp.log2(jnp.maximum(tts, 1.))) - 6.)
    q_small = jnp.maximum(
        24.0, 2. ** n_small * jnp.floor(tts / 2. ** n_small))
    n_big = jnp.floor(
        jnp.log2(jnp.maximum(tts - 24., 1.))) - 5.
    q_big = jnp.maximum(
        3840.0, 2. ** n_big * jnp.round((tts - 24.) / 2. ** n_big))
    n_info_q = jnp.where(tts <= 3824., q_small, q_big)

    num_cb = jnp.where(
        n_info_q <= 3824., 1.0,
        jnp.where(target_coderate <= 0.25,
                  jnp.ceil((n_info_q + 24.) / 3816.),
                  jnp.where(n_info_q > 8424.,
                            jnp.ceil((n_info_q + 24.) / 8424.), 1.)))

    idx = jnp.searchsorted(jnp.asarray(_TAB51321, jnp.float32),
                           n_info_q, side="left")
    idx = jnp.minimum(idx, len(_TAB51321) - 1)
    tbs_small = jnp.asarray(_TAB51321, jnp.float32)[idx]
    tbs_big = (8. * num_cb * jnp.ceil((n_info_q + 24.)
                                      / (8. * num_cb)) - 24.)
    tb_size = jnp.where(n_info_q <= 3824., tbs_small, tbs_big)
    tb_crc = jnp.where(tb_size > 3824., 24., 16.)
    cb_crc = jnp.where(num_cb > 1., 24., 0.)
    cb_size = (jnp.floor((tb_size + tb_crc) / num_cb)
               + cb_crc).astype(jnp.int32)
    return cb_size, num_cb.astype(jnp.int32)


def calculate_num_coded_bits(modulation_order, num_prbs,
                             num_ofdm_symbols, num_dmrs_per_prb,
                             num_layers=1, num_ov=0, tb_scaling=1.0,
                             precision=None):
    """Number of coded bits fitting in a slot
    (reference nr/utils.py:423)."""
    n_re_per_prb = 12 * np.asarray(num_ofdm_symbols) \
        - np.asarray(num_dmrs_per_prb) - np.asarray(num_ov)
    n_re_per_prb = np.minimum(156, n_re_per_prb)
    num_coded_bits = np.asarray(tb_scaling) * (
        n_re_per_prb * np.asarray(num_prbs)
        * np.asarray(modulation_order) * np.asarray(num_layers))
    return num_coded_bits.astype(np.int32)


_TAB51321 = np.array(
    [-1, 24, 32, 40, 48, 56, 64, 72, 80, 88, 96, 104, 112, 120, 128,
     136, 144, 152, 160, 168, 176, 184, 192, 208, 224, 240, 256,
     272, 288, 304, 320, 336, 352, 368, 384, 408, 432, 456, 480,
     504, 528, 552, 576, 608, 640, 672, 704, 736, 768, 808, 848,
     888, 928, 984, 1032, 1064, 1128, 1160, 1192, 1224, 1256,
     1288, 1320, 1352, 1416, 1480, 1544, 1608, 1672, 1736, 1800,
     1864, 1928, 2024, 2088, 2152, 2216, 2280, 2408, 2472, 2536,
     2600, 2664, 2728, 2792, 2856, 2976, 3104, 3240, 3368, 3496,
     3624, 3752, 3824], dtype=np.float64)


def calculate_tb_size(modulation_order, target_coderate,
                      target_tb_size=None, num_coded_bits=None,
                      num_prbs=None, num_ofdm_symbols=None,
                      num_dmrs_per_prb=None, num_layers=1, num_ov=0,
                      tb_scaling=1.0, return_cw_length=True,
                      verbose=False, precision=None):
    """Transport block size per TS 38.214 Sec. 5.1.3.2 / 6.1.4.2
    (reference nr/utils.py:473).

    Returns (tb_size, cb_size, num_cb, tb_crc_length, cb_crc_length
    [, cw_length])."""
    modulation_order = np.asarray(modulation_order, np.int32)
    target_coderate = np.asarray(target_coderate, np.float64)
    shape = modulation_order.shape
    num_layers = np.broadcast_to(np.asarray(num_layers, np.int32),
                                 shape)
    tb_scaling = np.broadcast_to(np.asarray(tb_scaling, np.float64),
                                 shape)

    if num_coded_bits is not None:
        num_coded_bits = np.asarray(num_coded_bits, np.int32)
        if np.any(num_coded_bits % modulation_order != 0):
            raise ValueError(
                "num_coded_bits must be a multiple of modulation_order.")
    else:
        if num_prbs is None or num_ofdm_symbols is None \
                or num_dmrs_per_prb is None:
            raise ValueError(
                "If num_coded_bits is None then num_prbs, "
                "num_ofdm_symbols, num_dmrs_per_prb must be specified.")
        num_coded_bits = calculate_num_coded_bits(
            modulation_order, num_prbs, num_ofdm_symbols,
            num_dmrs_per_prb, num_layers, num_ov, tb_scaling,
            precision=precision)
    if np.any(num_coded_bits % num_layers != 0):
        raise ValueError("num_coded_bits must be a multiple of "
                         "num_layers")

    if target_tb_size is None:
        target_tb_size = target_coderate * num_coded_bits
    target_tb_size = np.asarray(target_tb_size, np.float64)

    # quantized intermediate number of information bits
    # (TS 38.214 Sec. 5.1.3.2 steps 3 and 4)
    with np.errstate(divide="ignore", invalid="ignore"):
        n_small = np.maximum(
            3.0, np.floor(np.log2(np.maximum(target_tb_size, 1))) - 6)
        q_small = np.maximum(
            24.0, 2 ** n_small * np.floor(target_tb_size / 2 ** n_small))
        n_big = np.floor(
            np.log2(np.maximum(target_tb_size - 24, 1))) - 5
        q_big = np.maximum(
            3840.0, 2 ** n_big * np.round(
                (target_tb_size - 24) / 2 ** n_big))
    n_info_q = np.where(target_tb_size <= 3824, q_small, q_big)

    num_cb = np.where(
        n_info_q <= 3824, 1.0,
        np.where(target_coderate <= 1 / 4,
                 np.ceil((n_info_q + 24) / 3816),
                 np.where(n_info_q > 8424,
                          np.ceil((n_info_q + 24) / 8424), 1.0)))

    # TBS for small blocks: smallest table entry >= n_info_q
    idx = np.searchsorted(_TAB51321, n_info_q, side="left")
    idx = np.minimum(idx, len(_TAB51321) - 1)
    tbs_small = _TAB51321[idx]
    tbs_big = 8 * num_cb * np.ceil((n_info_q + 24) / (8 * num_cb)) - 24
    tb_size = np.where(n_info_q <= 3824, tbs_small,
                       tbs_big).astype(np.int32)
    num_cb = num_cb.astype(np.int32)
    tb_crc_length = np.where(tb_size > 3824, 24, 16).astype(np.int32)
    cb_crc_length = np.where(num_cb > 1, 24, 0).astype(np.int32)
    cb_size = ((tb_size + tb_crc_length) // num_cb
               + cb_crc_length).astype(np.int32)

    if not return_cw_length:
        return tb_size, cb_size, num_cb, tb_crc_length, cb_crc_length

    # rate-matched codeword lengths per CB (TS 38.212 Sec. 5.4.2.1)
    ql = num_layers * modulation_order
    num_last = (num_coded_bits // ql) % num_cb
    cw_last = ql * np.ceil(num_coded_bits / (ql * num_cb)).astype(
        np.int64)
    num_first = num_cb - num_last
    cw_first = ql * np.floor(num_coded_bits / (ql * num_cb)).astype(
        np.int64)

    nf = np.reshape(num_first, (-1,))
    cf = np.reshape(cw_first, (-1,))
    nl = np.reshape(num_last, (-1,))
    cl = np.reshape(cw_last, (-1,))
    num_cols = int(np.max(nf + nl))
    r = np.arange(num_cols)[None, :]
    cw_length = np.where(
        r < nf[:, None], cf[:, None],
        np.where(r < (nf + nl)[:, None], cl[:, None], 0))
    cw_length = cw_length.reshape(shape + (num_cols,)).astype(np.int32)
    return (tb_size, cb_size, num_cb, tb_crc_length, cb_crc_length,
            cw_length)


# ----------------------------------------------------------------------
# SYS-facing adapters (reference nr/utils.py:307,813,860)
# ----------------------------------------------------------------------
from ..utils.misc import (MCSDecoder, TransportBlock,  # noqa: E402
                          SingleLinkChannel)


class MCSDecoderNR(MCSDecoder):
    """5G-NR MCS index -> (modulation order, coderate) mapping
    (wraps :func:`decode_mcs_index`; reference nr/utils.py:307).
    mcs_category: 0 for PUSCH, 1 for PDSCH."""

    def call(self, mcs_index, mcs_table_index, mcs_category, *,
             check_index_validity=True, transform_precoding=True,
             pi2bpsk=False, verbose=False, **kwargs):
        # transform_precoding defaults to True, matching the
        # reference's MCSDecoderNR (nr/utils.py:307) - the shipped
        # BLER tables were generated under this default.
        import jax
        if any(isinstance(a, jax.core.Tracer)
               for a in (mcs_index, mcs_table_index, mcs_category)):
            # traced inputs (jitted SYS loop): pure-jnp gather path
            import jax.numpy as jnp
            mod, rate = decode_mcs_index_jit(
                mcs_index, table_index=mcs_table_index,
                is_pusch=(jnp.asarray(mcs_category) == 0),
                transform_precoding=transform_precoding,
                pi2bpsk=pi2bpsk)
            return mod, rate.astype(self.rdtype)
        mod, rate = decode_mcs_index(
            np.asarray(mcs_index),
            table_index=np.asarray(mcs_table_index),
            is_pusch=(np.asarray(mcs_category) == 0),
            transform_precoding=transform_precoding,
            pi2bpsk=pi2bpsk,
            check_index_validity=check_index_validity,
            verbose=verbose)
        return np.asarray(mod, np.int32), np.asarray(rate,
                                                     self.np_rdtype)


class TransportBlockNR(TransportBlock):
    """Number and size of code blocks in a 5G-NR transport block
    (wraps :func:`calculate_tb_size`; reference nr/utils.py:813)."""

    def call(self, modulation_order, target_coderate, num_coded_bits,
             **kwargs):
        import jax
        if any(isinstance(a, jax.core.Tracer)
               for a in (modulation_order, target_coderate,
                         num_coded_bits)):
            # traced inputs (jitted SYS loop): pure-jnp arithmetic
            return calculate_cb_size_jit(
                modulation_order, target_coderate, num_coded_bits)
        _, cb_size, num_cb, *_ = calculate_tb_size(
            np.asarray(modulation_order),
            np.asarray(target_coderate),
            num_coded_bits=np.asarray(num_coded_bits),
            tb_scaling=1., return_cw_length=False, verbose=False)
        return (np.asarray(cb_size, np.int32),
                np.asarray(num_cb, np.int32))


class CodedAWGNChannelNR(SingleLinkChannel):
    """5G-NR single-link LDPC-coded AWGN channel for BLER table
    generation (reference nr/utils.py:860).  Call:
    (batch_size, ebno_db[, key]) -> (bits, bits_hat)."""

    def __init__(self, num_bits_per_symbol=None, num_info_bits=None,
                 target_coderate=None, num_iter_decoder=20,
                 cn_update_decoder="boxplus-phi", precision=None,
                 **kwargs):
        super().__init__(num_bits_per_symbol, num_info_bits,
                         target_coderate, precision=precision)
        self._num_iter_decoder = int(num_iter_decoder)
        self._cn_update_decoder = cn_update_decoder
        self._kwargs = kwargs
        self._built_for = None

    def _build(self):
        # Lazily (re)build when the code parameters change
        spec = (self.num_bits_per_symbol, self.num_info_bits,
                self.target_coderate)
        if self._built_for == spec:
            return
        from ..mapping import Mapper, Demapper, BinarySource
        from ..channel import AWGN
        from ..fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
        self._binary_source = BinarySource(precision=self.precision)
        self._mapper = Mapper("qam", self.num_bits_per_symbol,
                              precision=self.precision)
        self._demapper = Demapper("app", "qam",
                                  self.num_bits_per_symbol,
                                  precision=self.precision)
        self._awgn = AWGN(precision=self.precision)
        self._encoder = LDPC5GEncoder(
            self.num_info_bits, self.num_coded_bits,
            num_bits_per_symbol=self.num_bits_per_symbol)
        self._decoder = LDPC5GDecoder(
            self._encoder, hard_out=True,
            num_iter=self._num_iter_decoder,
            cn_update=self._cn_update_decoder,
            precision=self.precision, **self._kwargs)
        self._built_for = spec

    def call(self, batch_size, ebno_db, key=None):
        import jax
        from ..config import config as _config
        from ..utils.misc import ebnodb2no
        self._build()
        if key is None:
            key = _config.next_key()
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db,
                       num_bits_per_symbol=self.num_bits_per_symbol,
                       coderate=self.target_coderate)
        bits = self._binary_source([batch_size, self.num_info_bits],
                                   key=k1)
        codewords = self._encoder(bits)
        x = self._mapper(codewords)
        y = self._awgn(x, no, key=k2)
        llr = self._demapper(y, no)
        bits_hat = self._decoder(llr)
        return bits, bits_hat
