"""Host-side IO: asset path resolution, image/HDR decode, OBJ parsing,
PPM/PNG film output, ffmpeg movie assembly.

These are the [HOST]-tagged components of SURVEY.md §2 (asset_loader, PPM
formatting, movie_maker) — pure Python/NumPy, never under jit.
"""
