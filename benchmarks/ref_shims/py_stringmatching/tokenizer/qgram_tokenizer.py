from .tokenizer import Tokenizer


class QgramTokenizer(Tokenizer):
    """Character q-grams with optional #/$ padding — the standard published
    definition (used by the reference's EDIT_DISTANCE join, which
    isinstance-checks for this class)."""

    def __init__(self, qval=2, padding=True, prefix_pad='#', suffix_pad='$',
                 return_set=False):
        super().__init__(return_set)
        self.qval = qval
        self.padding = padding
        self.prefix_pad = prefix_pad
        self.suffix_pad = suffix_pad

    def tokenize(self, input_string):
        s = input_string
        if self.padding:
            s = (self.prefix_pad * (self.qval - 1) + s +
                 self.suffix_pad * (self.qval - 1))
        grams = [s[i:i + self.qval] for i in range(len(s) - self.qval + 1)]
        return self._finish(grams)
