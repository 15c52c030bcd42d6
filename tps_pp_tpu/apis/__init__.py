from .recognizer import TextRecognizer, build_recognizer

__all__ = ['TextRecognizer', 'build_recognizer']
