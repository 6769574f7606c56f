"""No-op stand-in for the `pyprind` progress-bar package (benchmark-support
shim — see six/__init__.py).  Progress display is irrelevant to timing; a
real ProgBar would only add I/O noise."""


class ProgBar:
    def __init__(self, iterations=0, *args, **kwargs):
        self.iterations = iterations

    def update(self, *args, **kwargs):
        pass

    def stop(self, *args, **kwargs):
        pass
