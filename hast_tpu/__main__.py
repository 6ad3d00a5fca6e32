"""`python -m hast_tpu` == `python -m hast_tpu.cli`."""

from hast_tpu.cli import main

if __name__ == "__main__":
    main()
