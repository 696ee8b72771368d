"""Flag-compatible CLI entry points: clip_fft, illustra, illustrip, cppn,
interpol (reference L5 layer, SURVEY.md §1)."""
