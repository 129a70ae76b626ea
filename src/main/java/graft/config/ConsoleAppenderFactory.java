package graft.config;

import java.io.Serializable;

import org.apache.logging.log4j.core.Layout;
import org.apache.logging.log4j.core.appender.ConsoleAppender;
import org.apache.logging.log4j.core.config.Configuration;

/**
 * Builds a console appender for {@link LogSetup}. Lives in Java because
 * log4j2's self-recursive builder generic ({@code B extends Builder<B>})
 * is not expressible for scalac's inference — the fluent chain only
 * typechecks from Java.
 */
public final class ConsoleAppenderFactory {
    private ConsoleAppenderFactory() {}

    public static ConsoleAppender create(
            String name, Layout<? extends Serializable> layout,
            Configuration conf) {
        return ConsoleAppender.newBuilder()
                .setName(name)
                .setTarget(ConsoleAppender.Target.SYSTEM_ERR)
                .setLayout(layout)
                .setConfiguration(conf)
                .build();
    }
}
