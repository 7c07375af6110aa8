"""One-ahead background-thread iteration, shared by the three pipelined
loops (trainer batches, fused-engine sequence prep, sharded-engine chunk
prep). The generator body — dataset reads, frame decode, cv2 augmentation,
np.stack — runs on the worker while the consumer's device step executes;
on a 1-core host one look-ahead worker is the right amount (more workers
would contend with the consumer thread; the reference instead uses an
8-worker DataLoader, /root/reference/train.py:132).

Only the worker thread ever touches the wrapped iterator, so any global-RNG
draws inside it happen in exactly the order they would inline — prefetched
pipelines stay bit-identical to their serial forms (pinned by tests in
test_trainer / test_sequence_tracker / test_multi_sequence)."""
from concurrent.futures import ThreadPoolExecutor


def prefetch_iter(it, enabled=True):
    """Yield from `it`, computing one element ahead on a background thread.

    enabled=False degrades to plain iteration (the serial reference
    behavior). The worker pool is a context manager, so an exception in the
    consumer closes the generator and joins the in-flight prefetch instead
    of leaking the thread and its (potentially hundreds of MB) result."""
    it = iter(it)
    if not enabled:
        yield from it
        return
    done = object()
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(next, it, done)
        while True:
            val = fut.result()
            if val is done:
                return
            fut = pool.submit(next, it, done)
            yield val
