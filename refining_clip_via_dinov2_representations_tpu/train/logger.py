"""Logging setup (`src/open_clip_train/logger.py:4-26`)."""

import logging


def setup_logging(log_file, level, include_host: bool = False):
    if include_host:
        import socket

        hostname = socket.gethostname()
        formatter = logging.Formatter(
            f"%(asctime)s |  {hostname} | %(levelname)s | %(message)s",
            datefmt="%Y-%m-%d,%H:%M:%S",
        )
    else:
        formatter = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s", datefmt="%Y-%m-%d,%H:%M:%S"
        )

    logging.root.setLevel(level)
    # scope to our own loggers (the reference sets EVERY registered logger,
    # which makes third-party atexit logging emit into closed streams)
    for name in logging.root.manager.loggerDict:
        if name.startswith("refining_clip"):
            logging.getLogger(name).setLevel(level)

    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(formatter)
    logging.root.addHandler(stream_handler)

    if log_file:
        file_handler = logging.FileHandler(filename=log_file)
        file_handler.setFormatter(formatter)
        logging.root.addHandler(file_handler)
