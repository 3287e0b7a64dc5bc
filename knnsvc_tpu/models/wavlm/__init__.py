from knnsvc_tpu.models.wavlm.model import (
    init_wavlm_params,
    wavlm_encode,
    wavlm_extract_layer,
    wavlm_extract_layer_bucketed,
    wavlm_extract_all_layers,
)

__all__ = [
    "init_wavlm_params",
    "wavlm_encode",
    "wavlm_extract_layer",
    "wavlm_extract_layer_bucketed",
    "wavlm_extract_all_layers",
]
