from . import descriptor, detection, hamming, image, linalg3

__all__ = ["descriptor", "detection", "hamming", "image"]
