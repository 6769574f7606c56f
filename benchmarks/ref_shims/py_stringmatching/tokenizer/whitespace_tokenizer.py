from .tokenizer import Tokenizer


class WhitespaceTokenizer(Tokenizer):
    def tokenize(self, input_string):
        return self._finish(input_string.split())
