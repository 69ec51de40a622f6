"""Transport block decoder (reference:
src/sionna/phy/nr/tb_decoder.py:15)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..fec.crc import CRCDecoder
from ..fec.scrambling import Descrambler
from ..fec.ldpc import LDPC5GDecoder
from .tb_encoder import TBEncoder

__all__ = ["TBDecoder"]


class TBDecoder(Block):
    """Descramble -> de-interleave -> de-segment -> LDPC decode ->
    CB/TB CRC. Returns (b_hat, tb_crc_status)."""

    def __init__(self, encoder, num_bp_iter=20,
                 cn_update="boxplus-phi", vn_update="sum",
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(encoder, TBEncoder):
            raise TypeError("encoder must be TBEncoder.")
        self._tb_encoder = encoder
        self._num_cbs = encoder.num_cbs
        self._decoder = LDPC5GDecoder(
            encoder=encoder.ldpc_encoder, num_iter=num_bp_iter,
            cn_update=cn_update, vn_update=vn_update, hard_out=True,
            return_infobits=True, precision=precision)
        self._descrambler = Descrambler(encoder.scrambler, binary=False,
                                        precision=precision) \
            if encoder.scrambler is not None else None
        self._tb_crc_decoder = CRCDecoder(encoder.tb_crc_encoder,
                                          precision=precision)
        self._cb_crc_decoder = CRCDecoder(encoder.cb_crc_encoder,
                                          precision=precision) \
            if encoder.cb_crc_encoder is not None else None

    @property
    def tb_size(self):
        return self._tb_encoder.tb_size

    @property
    def k(self):
        return self._tb_encoder.tb_size

    @property
    def n(self):
        return self._tb_encoder.n

    def call(self, inputs):
        enc = self._tb_encoder
        llr_ch = jnp.asarray(inputs, self.rdtype)
        input_shape = llr_ch.shape
        llr_ch = jnp.reshape(llr_ch, (-1, enc.num_tx, enc.n))
        if self._descrambler is not None:
            llr_ch = self._descrambler(llr_ch)
        num_fillers = (enc.ldpc_encoder.n * enc.num_cbs
                       - int(np.sum(enc.cw_lengths)))
        llr_int = jnp.concatenate(
            [llr_ch, jnp.zeros((llr_ch.shape[0], enc.num_tx,
                                num_fillers), llr_ch.dtype)], axis=-1)
        llr_int = jnp.take(llr_int, jnp.asarray(enc.output_perm_inv),
                           axis=-1)
        llr_cb = jnp.reshape(llr_int, (-1, enc.num_tx, self._num_cbs,
                                       enc.ldpc_encoder.n))
        u_hat_cb = self._decoder(llr_cb)
        if self._cb_crc_decoder is not None:
            u_hat_cb, _ = self._cb_crc_decoder(u_hat_cb)
        u_hat_tb = jnp.reshape(
            u_hat_cb,
            (-1, enc.num_tx,
             self.tb_size + enc.tb_crc_encoder.crc_length))
        u_hat, tb_crc_status = self._tb_crc_decoder(u_hat_tb)
        out_shape = list(input_shape)
        out_shape[-1] = self.tb_size
        u_hat = jnp.reshape(u_hat, out_shape)
        status_shape = out_shape[:-1]
        tb_crc_status = jnp.reshape(tb_crc_status, status_shape)
        if enc.k_padding > 0:
            u_hat = u_hat[..., :-enc.k_padding]
        return u_hat.astype(self.rdtype), tb_crc_status
