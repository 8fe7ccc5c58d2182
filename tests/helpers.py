"""Shared test utilities."""


class KillAfter:
    """Dataset proxy raising after N merged batches ACROSS epochs
    (simulated preemption); delegates everything else to the dataset."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, n
        self.count = 0

    def __getattr__(self, name):
        return getattr(self.ds, name)

    def batches(self, **kw):
        for b in self.ds.batches(**kw):
            if self.count == self.n:
                raise RuntimeError("simulated preemption")
            self.count += 1
            yield b
