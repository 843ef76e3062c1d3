"""Model zoo (flax.linen), TPU-first rebuilds of the reference model layer.

- conformer: from-scratch Conformer encoder (reference lid/conformer.py)
- pooling: wespeaker pooling zoo (reference lid/model/pooling_layers.py)
- xvector: TDNN x-vector (reference lid/model/xvector.py, PretrainLidModel.py:273)
- resnet: wespeaker ResNet family (reference lid/model/resnet.py)
- classifier: LID classifier backends (reference lid/PretrainLidModel.py)
- multilang: per-language CTC heads as stacked experts + LangDiscriminator
  (reference lid/WavLMMutiLangModel.py, lid/Wav2vecMutiLangModel.py)
- wavlm / wav2vec2: SSL upstream encoders with torch ckpt converters
- se / fasnet / seldnet: enhancement zoo (reference se/models/ — DPRNN
  masker, FaSNet-TAC beamformer, SELDNet SED+DOA)
"""

from speechlid_tpu.models.conformer import (
    ConformerBlock,
    ConformerModel,
    Conv1dSubSampling2,
    Conv2dSubsampling,
    FBankLayer,
)
from speechlid_tpu.models.fasnet import FaSNetOrigin, FaSNetTAC
from speechlid_tpu.models.se import DPRNNEnhancer, si_snr
from speechlid_tpu.models.seldnet import (
    SELDNet,
    seldnet_augmented,
    seldnet_vanilla,
)
