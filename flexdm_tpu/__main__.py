"""``python -m flexdm_tpu`` trains an MFP model (reference ``__main__.py``)."""

from .cli import train_main

if __name__ == "__main__":
    train_main()
