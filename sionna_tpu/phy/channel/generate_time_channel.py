"""Generate discrete-time channels from a ChannelModel (reference:
src/sionna/phy/channel/generate_time_channel.py:9)."""


from ..block import Block
from .utils import cir_to_time_channel


class GenerateTimeChannel(Block):
    """Samples (a, tau) and converts to discrete-time channel taps.

    Output: [batch, num_rx, num_rx_ant, num_tx, num_tx_ant,
    num_time_samples + l_tot - 1, l_tot].
    """

    def __init__(self, channel_model, bandwidth, num_time_samples,
                 l_min, l_max, normalize_channel=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._cir_sampler = channel_model
        self._bandwidth = float(bandwidth)
        self._num_time_steps = int(num_time_samples)
        self._l_min = int(l_min)
        self._l_max = int(l_max)
        self._l_tot = self._l_max - self._l_min + 1
        self._normalize = bool(normalize_channel)

    def call(self, batch_size, key=None):
        kwargs = {} if key is None else {"key": key}
        a, tau = self._cir_sampler(
            batch_size, self._num_time_steps + self._l_tot - 1,
            self._bandwidth, **kwargs)
        return cir_to_time_channel(self._bandwidth, a, tau, self._l_min,
                                   self._l_max,
                                   normalize=self._normalize)
