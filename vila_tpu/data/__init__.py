"""Host-side data layer: media preprocessing, tokenization, datasets."""
