"""Model families: transformer stack, C-ViViT tokenizer, MaskGit, Phenaki."""
