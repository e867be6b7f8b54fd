"""`python -m refining_clip_via_dinov2_representations_tpu` → training CLI."""

from .train.main import main

if __name__ == "__main__":
    main()
