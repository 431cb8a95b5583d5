"""Host-side data layer: tokenizer, vocabulary, COCO reader, batch pipeline."""

from depth_image_captioning_pub_tpu.data.tokenizer import (
    tokenize_caption,
    untokenize_caption,
    SpecialTokens,
)
from depth_image_captioning_pub_tpu.data.vocab import build_vocab, load_vocab, save_vocab
