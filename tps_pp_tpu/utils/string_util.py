"""String utilities (reference mmocr/utils/string_util.py:1-36)."""


class StringStrip:
    """Strip leading/trailing characters from annotation strings.

    strip: enable stripping; strip_pos: 'both' | 'left' | 'right';
    strip_str: character set to remove (None = whitespace).
    """

    def __init__(self, strip=True, strip_pos='both', strip_str=None):
        assert isinstance(strip, bool)
        assert strip_pos in ('both', 'left', 'right')
        assert strip_str is None or isinstance(strip_str, str)
        self.strip = strip
        self.strip_pos = strip_pos
        self.strip_str = strip_str

    def __call__(self, in_str):
        if not self.strip:
            return in_str
        if self.strip_pos == 'left':
            return in_str.lstrip(self.strip_str)
        if self.strip_pos == 'right':
            return in_str.rstrip(self.strip_str)
        return in_str.strip(self.strip_str)
