"""5G NR sub-package (reference: src/sionna/phy/nr/__init__.py)."""

from .config import Config
from .carrier_config import CarrierConfig
from .pusch_dmrs_config import PUSCHDMRSConfig
from .tb_config import TBConfig
from .pusch_config import PUSCHConfig, check_pusch_configs
from .layer_mapping import LayerMapper, LayerDemapper
from .tb_encoder import TBEncoder
from .tb_decoder import TBDecoder
from .pusch_pilot_pattern import PUSCHPilotPattern
from .pusch_precoder import PUSCHPrecoder
from .pusch_channel_estimation import PUSCHLSChannelEstimator
from .pusch_transmitter import PUSCHTransmitter
from .pusch_receiver import PUSCHReceiver
from . import utils
from .utils import (generate_prng_seq, decode_mcs_index,
                    decode_mcs_index_jit, calculate_tb_size,
                    calculate_cb_size_jit, calculate_num_coded_bits)
