"""MIMO layer mapping per TS 38.211 Sec. 6.3.1.3 / 7.3.1.3
(reference: src/sionna/phy/nr/layer_mapping.py:11,191)."""

import jax.numpy as jnp

from ..block import Block
from ..utils.tensors import split_dim, flatten_last_dims

__all__ = ["LayerMapper", "LayerDemapper"]


class LayerMapper(Block):
    """Maps modulated symbols to MIMO layers.

    Input [..., n] (or a list of two codewords for >= 5 layers) ->
    [..., num_layers, n / num_layers].
    """

    def __init__(self, num_layers=1, verbose=False, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        if num_layers not in range(1, 9):
            raise ValueError("num_layers must be between 1 and 8.")
        self._num_layers = num_layers
        if num_layers < 5:
            self._num_codewords = 1
        else:
            self._num_codewords = 2
            splits = {5: (2, 3), 6: (3, 3), 7: (3, 4), 8: (4, 4)}
            self._num_layers0, self._num_layers1 = splits[num_layers]
        if verbose:
            print("Number of layers: ", num_layers)

    @property
    def num_codewords(self):
        return self._num_codewords

    @property
    def num_layers(self):
        return self._num_layers

    @property
    def num_layers0(self):
        return self._num_layers if self._num_codewords == 1 \
            else self._num_layers0

    @property
    def num_layers1(self):
        return 0 if self._num_codewords == 1 else self._num_layers1

    def call(self, inputs):
        if self._num_codewords == 1:
            x = jnp.asarray(inputs)
            s = x.shape[-1]
            if s % self._num_layers != 0:
                raise ValueError("Last dimension must be a multiple of "
                                 "num_layers.")
            y = split_dim(x, (s // self._num_layers, self._num_layers),
                          x.ndim - 1)
        else:
            x0 = jnp.asarray(inputs[0])
            x1 = jnp.asarray(inputs[1])
            y0 = split_dim(x0, (x0.shape[-1] // self._num_layers0,
                                self._num_layers0), x0.ndim - 1)
            y1 = split_dim(x1, (x1.shape[-1] // self._num_layers1,
                                self._num_layers1), x1.ndim - 1)
            y = jnp.concatenate([y0, y1], axis=-1)
        return jnp.swapaxes(y, -1, -2)


class LayerDemapper(Block):
    """Reverts layer mapping, grouping LLRs per symbol
    (reference layer_mapping.py:191).

    Input [..., num_layers, n] -> [..., n * num_layers] (or two
    codewords).
    """

    def __init__(self, layer_mapper, num_bits_per_symbol=1,
                 precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(layer_mapper, LayerMapper):
            raise TypeError("layer_mapper must be LayerMapper.")
        self._mapper = layer_mapper
        self._num_bits_per_symbol = int(num_bits_per_symbol)

    def call(self, inputs):
        x = jnp.asarray(inputs)
        if x.shape[-2] != self._mapper.num_layers:
            raise ValueError(
                "Input shape must be [..., num_layers, n].")
        if x.shape[-1] % self._num_bits_per_symbol != 0:
            raise ValueError("Last dimension must be a multiple of "
                             "num_bits_per_symbol.")
        s = x.shape[-1]
        x = split_dim(x, (s // self._num_bits_per_symbol,
                          self._num_bits_per_symbol), x.ndim - 1)
        x = jnp.swapaxes(x, -2, -3)
        if self._mapper.num_codewords == 1:
            return flatten_last_dims(x, 3)
        y0 = flatten_last_dims(x[..., :self._mapper.num_layers0, :], 3)
        y1 = flatten_last_dims(x[..., self._mapper.num_layers0:, :], 3)
        return [y0, y1]
