"""Checkpoint mapping demo — the script equivalent of reference notebook 4
('Save Mappings and Loading SpeechT5 Base'): show the fairseq->pytree and
HF->pytree import paths with strict-key verification.

Without a real speecht5_base.pt this demonstrates on a random tiny HF model
(requires torch+transformers); pass --fairseq_ckpt to convert the real one.
"""

import argparse

import jax

from loco_asr_tpu.models.speecht5 import import_torch, model as st5
from loco_asr_tpu.models.speecht5.config import tiny_config
from loco_asr_tpu.utils.pytree import assert_trees_match, flatten_with_paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fairseq_ckpt", default=None,
                   help="path to the original speecht5_base.pt")
    p.add_argument("--out", default=None, help="save converted tree (.npz)")
    args, _ = p.parse_known_args()

    cfg = tiny_config(apply_spec_augment=False)
    ours = st5.asr_init(jax.random.PRNGKey(0), cfg)

    if args.fairseq_ckpt:
        import torch

        ckpt = torch.load(args.fairseq_ckpt, map_location="cpu",
                          weights_only=False)
        grafted = import_torch.graft_fairseq_into_asr(ours, ckpt)
        print("fairseq graft OK:",
              len(flatten_with_paths(grafted["encoder"]["wrapped_encoder"])),
              "encoder leaves")
        if args.out:
            from loco_asr_tpu.utils.checkpoint import save_npz
            save_npz(args.out, grafted)
            print("saved to", args.out)
        return

    # demo: random HF model -> our tree, strict-key checked
    import torch  # noqa: F401
    from transformers import SpeechT5Config as HFConfig
    from transformers.models.speecht5.modeling_speecht5 import SpeechT5ForSpeechToText

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        conv_dim=list(cfg.conv_dim), conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        max_speech_positions=cfg.max_speech_positions,
        max_text_positions=cfg.max_text_positions,
        encoder_max_relative_position=cfg.encoder_max_relative_position,
        speech_decoder_prenet_units=cfg.speech_decoder_prenet_units,
        speech_decoder_postnet_units=cfg.speech_decoder_postnet_units,
        num_mel_bins=cfg.num_mel_bins,
        speaker_embedding_dim=cfg.speaker_embedding_dim)
    hf = SpeechT5ForSpeechToText(hf_cfg)
    imported = import_torch.load_hf_state_dict(hf.state_dict())
    assert_trees_match(ours, imported)
    print("HF import: strict key+shape match,",
          len(flatten_with_paths(imported)), "leaves")


if __name__ == "__main__":
    main()
