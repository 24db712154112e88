from cgd_tpu.models.clip.configs import CLIP_CONFIGS, CLIPConfig  # noqa: F401
from cgd_tpu.models.clip.model import (  # noqa: F401
    encode_image,
    encode_text,
    init_clip,
)
from cgd_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize  # noqa: F401
