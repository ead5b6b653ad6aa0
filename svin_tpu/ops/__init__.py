from . import descriptor, detection, hamming, image, linalg3, solve

__all__ = ["descriptor", "detection", "hamming", "image", "linalg3", "solve"]
