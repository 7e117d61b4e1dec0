"""Root conftest: re-exec pytest in a sanitized environment.

The ambient environment may inject a TPU PJRT plugin via a sitecustomize
on PYTHONPATH whose remote-compile path slows (and can hang) every XLA
compilation.  Tests must be hermetic on the virtual CPU mesh, and the
sitecustomize runs at interpreter start — before any conftest — so the
only reliable neutralization is one re-exec with a clean environment.
This lives in the repo root so it runs before pytest's capture starts.
"""

import os
import sys

_MARKER = 'CGS_VMC_TESTS_SANITIZED'


def _needs_sanitizing() -> bool:
    if os.environ.get(_MARKER):
        return False
    pythonpath = os.environ.get('PYTHONPATH', '')
    return ('axon' in pythonpath
            or os.environ.get('JAX_PLATFORMS', '') not in ('', 'cpu'))


def _restore_terminal_fds() -> None:
    """Best-effort undo of pytest's global fd capture before exec.

    At conftest-import time pytest has already redirected fds 1/2 into
    anonymous tempfiles, keeping dups of the originals.  The exec'd child
    would write its whole report into a tempfile nobody reads.  Recover
    the originals from /proc/self/fd: they are the lowest non-deleted,
    non-devnull fds above 2 (pytest's saves are created in stdin, stdout,
    stderr order).
    """
    try:
        entries = {}
        for name in os.listdir('/proc/self/fd'):
            fd = int(name)
            try:
                entries[fd] = os.readlink(f'/proc/self/fd/{fd}')
            except OSError:
                continue
        if '(deleted)' not in entries.get(1, ''):
            return  # capture not active; nothing to restore
        candidates = [
            fd for fd in sorted(entries)
            if fd > 2 and '(deleted)' not in entries[fd]
            and not entries[fd].startswith('socket:')
        ]
        nonnull = [fd for fd in candidates if entries[fd] != '/dev/null']
        pool = nonnull or candidates
        if not pool:
            return
        os.dup2(pool[0], 1)
        os.dup2(pool[1] if len(pool) > 1 else pool[0], 2)
    except OSError:
        pass


if _needs_sanitizing():
    env = dict(os.environ)
    env[_MARKER] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = ':'.join(
        p for p in env.get('PYTHONPATH', '').split(':')
        if p and 'axon' not in p)
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    sys.stdout.flush()
    sys.stderr.flush()
    _restore_terminal_fds()
    os.execve(sys.executable,
              [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)
