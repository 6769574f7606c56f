class Tokenizer:
    """Base tokenizer API the reference validates against
    (utils/validation.py:80-95): isinstance check + the return_set flag
    protocol used by its set-measure joins."""

    def __init__(self, return_set=False):
        self.return_set = return_set

    def get_return_set(self):
        return self.return_set

    def set_return_set(self, return_set):
        self.return_set = return_set
        return True

    def _finish(self, tokens):
        if self.return_set:
            return list(dict.fromkeys(tokens))  # order-preserving dedupe
        return tokens
