"""Generate frequency-domain channels from a ChannelModel (reference:
src/sionna/phy/channel/generate_ofdm_channel.py:9)."""


from ..block import Block
from .utils import subcarrier_frequencies, cir_to_ofdm_channel


class GenerateOFDMChannel(Block):
    """Samples (a, tau) from a channel model and converts to
    frequency responses over a resource grid.

    Output: [batch, num_rx, num_rx_ant, num_tx, num_tx_ant,
    num_ofdm_symbols, fft_size].
    """

    def __init__(self, channel_model, resource_grid, normalize_channel=False,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._cir_sampler = channel_model
        self._rg = resource_grid
        self._normalize = bool(normalize_channel)
        self._frequencies = subcarrier_frequencies(
            resource_grid.fft_size, resource_grid.subcarrier_spacing,
            precision=self.precision)
        self._sampling_frequency = 1. / resource_grid.ofdm_symbol_duration

    def call(self, batch_size, key=None):
        kwargs = {} if key is None else {"key": key}
        a, tau = self._cir_sampler(batch_size,
                                   self._rg.num_ofdm_symbols,
                                   self._sampling_frequency, **kwargs)
        return cir_to_ofdm_channel(self._frequencies, a, tau,
                                   normalize=self._normalize)
