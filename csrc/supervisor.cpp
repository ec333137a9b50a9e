// unsloth-supervisor: native process shell for the studio backend.
//
// SURVEY 2k.5: the reference ships an 18.9k-LoC Tauri (Rust) desktop
// shell whose core duties are process spawn/reap, preflight checks,
// crash restart, and signal-clean shutdown (reference: studio/src-tauri/
// src/process.rs, preflight/*.rs, main.rs). Rust is unavailable in this
// image, so the TPU-native equivalent is this small C++ supervisor: it
// preflights the environment, spawns the backend as a child process
// group, reaps and restarts it with exponential backoff on crash,
// forwards SIGTERM/SIGINT for graceful shutdown, and waits for the
// loopback port to accept connections before declaring health.
//
// Build: g++ -O3 -o unsloth-supervisor supervisor.cpp
// Usage: unsloth-supervisor [--port N] [--max-restarts K]
//                           [--pidfile PATH] [--log PATH]
//                           -- <command> [args...]

#include <arpa/inet.h>
#include <cerrno>
#include <cstdarg>
#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <sys/socket.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

static volatile sig_atomic_t g_stop = 0;
static volatile sig_atomic_t g_child = -1;

static void on_signal(int sig) {
    g_stop = 1;
    pid_t c = g_child;
    if (c > 0) kill(-c, sig);  // forward to the child's process group
}

static FILE* g_log = stderr;

static void logf(const char* fmt, ...) {
    char ts[32];
    time_t now = time(nullptr);
    strftime(ts, sizeof ts, "%Y-%m-%d %H:%M:%S", localtime(&now));
    fprintf(g_log, "[%s] supervisor: ", ts);
    va_list ap;
    va_start(ap, fmt);
    vfprintf(g_log, fmt, ap);
    va_end(ap);
    fputc('\n', g_log);
    fflush(g_log);
}

// Preflight: can we bind a loopback socket at all (networking sane)?
static bool preflight_network() {
    int fd = socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return false;
    close(fd);
    return true;
}

static bool port_accepts(int port, int timeout_ms) {
    int fd = socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return false;
    struct timeval tv = {timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof tv);
    sockaddr_in addr = {};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
    bool ok = connect(fd, (sockaddr*)&addr, sizeof addr) == 0;
    close(fd);
    return ok;
}

static pid_t spawn(char** argv) {
    pid_t pid = fork();
    if (pid == 0) {
        setpgid(0, 0);  // own process group: signals reach grandchildren
        execvp(argv[0], argv);
        fprintf(stderr, "supervisor: exec %s failed: %s\n", argv[0],
                strerror(errno));
        _exit(127);
    }
    return pid;
}

int main(int argc, char** argv) {
    int port = 0, max_restarts = 5;
    const char* pidfile = nullptr;
    const char* logpath = nullptr;
    int i = 1;
    for (; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--" ) { ++i; break; }
        else if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
        else if (a == "--max-restarts" && i + 1 < argc)
            max_restarts = atoi(argv[++i]);
        else if (a == "--pidfile" && i + 1 < argc) pidfile = argv[++i];
        else if (a == "--log" && i + 1 < argc) logpath = argv[++i];
        else {
            fprintf(stderr, "unknown arg: %s\n", argv[i]);
            return 2;
        }
    }
    if (i >= argc) {
        fprintf(stderr,
                "usage: unsloth-supervisor [--port N] [--max-restarts K]"
                " [--pidfile P] [--log P] -- <command> [args...]\n");
        return 2;
    }
    if (logpath) {
        FILE* f = fopen(logpath, "a");
        if (f) g_log = f;
    }
    if (!preflight_network()) {
        logf("preflight failed: cannot create loopback sockets");
        return 3;
    }
    if (port > 0 && port_accepts(port, 200)) {
        logf("preflight failed: port %d already in use", port);
        return 3;
    }

    struct sigaction sa = {};
    sa.sa_handler = on_signal;
    sigaction(SIGTERM, &sa, nullptr);
    sigaction(SIGINT, &sa, nullptr);
    signal(SIGPIPE, SIG_IGN);

    char** child_argv = argv + i;
    int restarts = 0;
    int backoff_s = 1;
    while (!g_stop) {
        pid_t pid = spawn(child_argv);
        if (pid < 0) {
            logf("fork failed: %s", strerror(errno));
            return 1;
        }
        g_child = pid;
        logf("started %s (pid %d)", child_argv[0], (int)pid);
        if (pidfile) {
            FILE* f = fopen(pidfile, "w");
            if (f) { fprintf(f, "%d\n", (int)pid); fclose(f); }
        }
        if (port > 0) {
            for (int t = 0; t < 600 && !g_stop; ++t) {  // up to ~60 s
                if (port_accepts(port, 100)) {
                    logf("healthy: port %d accepting", port);
                    break;
                }
                usleep(100 * 1000);
            }
        }
        int status = 0;
        time_t started = time(nullptr);
        while (waitpid(pid, &status, 0) < 0 && errno == EINTR) {}
        g_child = -1;
        int code = WIFEXITED(status) ? WEXITSTATUS(status)
                   : 128 + WTERMSIG(status);
        if (g_stop || code == 0) {
            logf("child exited cleanly (code %d); supervisor done", code);
            break;
        }
        // crash: restart with backoff; a stable run resets the budget
        if (time(nullptr) - started > 60) { restarts = 0; backoff_s = 1; }
        if (++restarts > max_restarts) {
            logf("crash (code %d): restart budget exhausted (%d)", code,
                 max_restarts);
            if (pidfile) unlink(pidfile);
            return 1;
        }
        logf("crash (code %d): restart %d/%d in %d s", code, restarts,
             max_restarts, backoff_s);
        for (int s = 0; s < backoff_s && !g_stop; ++s) sleep(1);
        if (backoff_s < 30) backoff_s *= 2;
    }
    if (pidfile) unlink(pidfile);
    return 0;
}
